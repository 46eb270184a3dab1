package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One writer PROCESS for the crash-fault commit tests
  * (CommitCrashSpec): publishes a single bucket row to the given table
  * root with a `SPARK_GRAFT_FAULT` injection point armed (set on this
  * process's environment by the parent), so the publish PARKS at the
  * named point — after claim-create, or after the data write — writes
  * the `SPARK_GRAFT_FAULT_MARK` marker, and waits to be SIGKILLed.
  * Unlike RaceWriter there is no outcome protocol: this process is
  * never supposed to return from publish; if it does (fault var unset
  * or point never reached) the parent's marker wait times out and the
  * spec fails.
  *
  * args: tableRoot writerId
  */
object CrashWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, id) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"crash-writer-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, id.toDouble)).toDF("user_id", "v")
      .withColumn("bucket", lit(1))
    // parks at the armed faultPoint inside publish; SIGKILLed there
    graft.sources.Commit.publishBuckets(df, root)
    spark.stop()
  }
}
