package graft

import graft.serve.DashboardServer
import graft.sources.Rest
import org.apache.spark.sql.functions._

/** End-to-end REST ingestion over REAL HTTP, in-process: the
  * DashboardServer serves query results as JSON on loopback, and the
  * `Rest.HttpFetch` binding (JDK HttpClient + JSON reader) ingests
  * them through the breaker-guarded priority sweep into a parquet
  * landing dir — the reference's live-API ingestion loop
  * (enhanced_ingestion.py:432-545) with the network replaced by
  * 127.0.0.1 (the sandbox has no egress; the client binding is the
  * production one).
  */
class HttpRestSpec extends SparkSpec {

  test("HttpFetch ingests a live JSON endpoint through the breaker sweep") {
    val srv = new DashboardServer(spark, sf0001,
      queryNames = Seq("q_dash_districts", "q_dash_metrics"))
    val port = srv.start()
    val landing = graft.util.TempRoot
      .freshDir("http_rest_landing").toString
    try {
      val breakers = scala.collection.mutable.Map.empty[String, Rest.CircuitBreaker]
      val ing = new Rest.Ingestion(
        Seq(
          Rest.HttpFetch.jsonEndpoint("districts", 1,
            s"http://127.0.0.1:$port/api/q_dash_districts"),
          Rest.HttpFetch.jsonEndpoint("metrics", 2,
            s"http://127.0.0.1:$port/api/q_dash_metrics"),
          // a 404 route: the fetch throws, the breaker records a failure
          Rest.HttpFetch.jsonEndpoint("broken", 3,
            s"http://127.0.0.1:$port/api/q_no_such_query")),
        breakerFor = n => breakers.getOrElseUpdate(n, new Rest.CircuitBreaker()))

      val results = ing.runOnce(spark, landing, "b1")
      val byName = results.map(r => r.source -> r).toMap
      assert(byName("districts").status == "ok")
      assert(byName("districts").rows > 0)
      assert(byName("metrics").status == "ok")
      assert(byName("metrics").rows > 0)
      assert(byName("broken").status == "failed")

      // the landed batch is the schema-union of both healthy endpoints,
      // stamped with source + batch + priority
      val landed = spark.read.parquet(landing)
      assert(landed.filter(col("batch_id") === "b1").count() ==
        byName("districts").rows + byName("metrics").rows)
      assert(landed.select("data_source").distinct().count() == 2)
      assert(landed.columns.contains("ingestion_priority"))

      // two more failing sweeps open the breaker (threshold 3): the
      // fourth sweep must SKIP the broken endpoint, not re-fetch it
      ing.runOnce(spark, landing, "b2")
      ing.runOnce(spark, landing, "b3")
      val r4 = ing.runOnce(spark, landing, "b4")
      assert(r4.find(_.source == "broken").get.status == "skipped_open")
      assert(r4.find(_.source == "districts").get.status == "ok")
    } finally {
      srv.stop()
    }
  }
}
