package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: materialize a key-shifted ×k replica of an existing
  * snapshot via [[ScaleUp.ensure]] so ad-hoc probes (e.g. the r21
  * inverse-scaling check — ratio<1 queries re-measured at sf1 through
  * the regular Bench) can point SPARK_GRAFT_SF_DIR at it without
  * running the full ScaleBench sweep.
  *
  * Usage: runMain graft.tools.GenScale <k> <outDir> [srcDir]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <k> <outDir> [srcDir]")
    val k = args(0).toInt
    val out = args(1)
    val src = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleUp.ensure(spark, src, out, k)
    spark.stop()
    println(s"GENSCALE_OK $out x$k from $src")
  }
}
