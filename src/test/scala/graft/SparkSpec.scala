package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM, one session). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // Quiesce + stop BEFORE Spark's own context-stop hook: a 9-minute
    // suite leaves ContextCleaner removes in flight at JVM exit, and
    // the unordered teardown used to spray RejectedExecutionException
    // traces over the test summary (see GraftShutdown).
    org.apache.spark.GraftShutdown.beforeSparkStops() {
      try s.streams.active.foreach(q =>
        try q.stop() catch { case scala.util.control.NonFatal(_) => () })
      catch { case scala.util.control.NonFatal(_) => () }
      org.apache.spark.GraftShutdown.quiesceAndStop(s.sparkContext)
    }
    s
  }
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark
  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("ERROR")
    super.beforeAll()
  }
  val sf0001 = "/root/testdata/sf0.001"
}
