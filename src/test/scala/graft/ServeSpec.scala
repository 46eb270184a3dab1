package graft

import graft.serve.DashboardServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The thin HTTP dashboard layer (SURVEY §3.3): route contract, JSON
  * payload shape, the 30 s-refresh TTL cache, and error handling.
  */
class ServeSpec extends SparkSpec {

  private def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())

  test("serves dashboard queries as JSON with a TTL cache") {
    var now = 0L
    val srv = new DashboardServer(spark, sf0001,
      queryNames = Seq("q_dash_districts", "q_dash_metrics"),
      ttlMillis = 30000L, clock = () => now)
    val port = srv.start()
    try {
      assert(get(port, "/healthz").body() == """{"ok":true}""")

      val r1 = get(port, "/api/q_dash_districts")
      assert(r1.statusCode() == 200)
      assert(r1.headers().firstValue("Content-Type").get()
        .startsWith("application/json"))
      // payload: non-empty JSON array of objects with the query's columns
      assert(r1.body().startsWith("[{") && r1.body().endsWith("}]"), r1.body())
      assert(r1.body().contains("\"district\"") ||
        r1.body().contains("\"region\"") || r1.body().contains(":"), r1.body())

      // within the TTL the page is served from cache — no Spark job
      val r2 = get(port, "/api/q_dash_districts")
      assert(r2.body() == r1.body())
      assert(srv.computeCount("q_dash_districts") == 1L)

      // past the TTL it recomputes (the 30 s auto-refresh contract)
      now += 30001L
      get(port, "/api/q_dash_districts")
      assert(srv.computeCount("q_dash_districts") == 2L)

      // unknown query → 404 with the route inventory, not a 500
      val r404 = get(port, "/api/q_nope")
      assert(r404.statusCode() == 404)
      assert(r404.body().contains("q_dash_districts"))
    } finally srv.stop()
  }

  test("the full 6-query dashboard page serves end-to-end") {
    val srv = new DashboardServer(spark, sf0001)
    val port = srv.start()
    try {
      for (q <- DashboardServer.DashboardQueries) {
        val r = get(port, s"/api/$q")
        assert(r.statusCode() == 200, s"$q -> ${r.statusCode()}: ${r.body()}")
        assert(r.body().startsWith("[") && r.body().length > 2,
          s"$q returned an empty page: ${r.body().take(100)}")
      }
    } finally srv.stop()
  }

  test("rejects unknown query names at construction") {
    intercept[IllegalArgumentException] {
      new DashboardServer(spark, sf0001, queryNames = Seq("q_not_a_query"))
    }
  }
}
