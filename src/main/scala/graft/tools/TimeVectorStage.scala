package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-step wall-clock of the VectorStage build, to keep the
  * once-per-snapshot index-build cost honest (it is reported in
  * BENCH_DETAIL's stage_build_secs).
  */
object TimeVectorStage {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STEP $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.Tables.embeddings(spark, dir)
    t("warm: count")(emb.count())
    import graft.queries.Vectors
    import graft.warehouse.Staging
    import graft.sources.Sources
    val b = Staging.bucketsFor(spark, dir, Seq("embeddings"), expansion = 3)
    println(s"buckets=$b")
    Seq("t_lsh", "t_ivf", "t_cb", "t_codes").foreach(Staging.freshTarget(spark, _))
    t("lsh write")(Sources.writeBucketed(
      Vectors.lshIndexRows(emb).repartition(b, col("bucket")), "t_lsh", "bucket", b))
    t("ivf write")(Sources.writeBucketed(
      Vectors.ivfAssigned(emb).repartition(b, col("cell")), "t_ivf", "cell", b))
    val sv = t("sv cache")(Vectors.pqSubvectors(emb).cache())
    val cb1 = t("pq codebook train")(Vectors.pqCodebook(sv))
    t("cb write") {
      val sp = spark; import sp.implicits._
      cb1.toDF("m", "code", "cvec").write
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet").saveAsTable("t_cb")
    }
    t("codes write")(Sources.writeBucketed(
      Vectors.pqAssign(sv, cb1)
        .select(col("vec_id"), col("m"), col("code"), col("d2"))
        .repartition(b, col("vec_id")), "t_codes", "vec_id", b))
    sv.unpersist()
    spark.stop()
  }
}
