package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Invariant tests for the round-12 additions. */
class Round12Spec extends SparkSpec {

  test("q_pagerank: no iteration shuffles the edge list (bucketed prEdges)") {
    // build the staged graph artifact OUTSIDE the measured window
    val edges = warehouse.GraphStage.prEdges(spark, sf0001)
    val nEdges = edges.count()
    val shuffleRecords = new AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SparkEntry.queries("q_pagerank")(spark, sf0001).collect()
      org.apache.spark.GraftListener.drain(spark.sparkContext, 10000)
      // two power iterations over a ~2|E| symmetrized list used to
      // shuffle edge-scale volume; with the src-bucketed layout the
      // remaining shuffles are vertex-scale (ranks out, pre-aggregated
      // contributions back) — well under ONE edge-list pass
      assert(shuffleRecords.get() < nEdges,
        s"shuffled ${shuffleRecords.get()} records for $nEdges edges — " +
          "an iteration is moving the edge list again")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("prEdges scan is bucketed: the rank join plans no exchange and no sort " +
      "on the edge side") {
    val edges = warehouse.GraphStage.prEdges(spark, sf0001)
    val ranks = edges.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1.0))
    val joined = edges.join(ranks.withColumnRenamed("node", "src"), "src")
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), p.take(2000))
  }
}
