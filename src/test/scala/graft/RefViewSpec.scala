package graft

import graft.sql.SqlGateway

/** The reference's four analytic views (SqlGateway.RefViews): column
  * parity with sql/real_data_schema.sql:181-258 and non-degenerate
  * derived metrics. The value-level gate lives in the q_view_* oracle
  * twins; these cases pin the properties the oracles can't state —
  * that the anomaly rate actually VARIES within a group, and that the
  * parity columns carry the documented synthesized values.
  */
class RefViewSpec extends SparkSpec {

  private def sql(q: String) = {
    SqlGateway.registerAll(spark, sf0001)
    SqlGateway.runSql(spark, q, maxRows = 0)
  }

  test("v_district_performance: anomaly_rate_percent takes strict-interior values") {
    val rates = sql(
      "SELECT anomaly_rate_percent FROM v_district_performance")
      .collect().map(_.getDouble(0))
    assert(rates.nonEmpty)
    assert(rates.exists(r => r > 0.0 && r < 100.0),
      s"rate is degenerate (0-or-100 only): ${rates.distinct.sorted.mkString(",")}")
    // and the flag is row-level, not type-level: some non-'error'
    // sensor-type group must carry a nonzero rate
    val nonError = sql(
      """SELECT anomaly_rate_percent FROM v_district_performance
         WHERE sensor_type <> 'error'""").collect().map(_.getDouble(0))
    assert(nonError.exists(_ > 0.0),
      "non-'error' groups must see out-of-band-value anomalies")
  }

  test("v_sensor_status carries the ref's measurement_unit and provider columns") {
    val rows = sql(
      """SELECT DISTINCT sensor_type, measurement_unit, provider
         FROM v_sensor_status""").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    // the unit mapping is keyed on the established type analogies
    assert(rows.collect { case ("view", u, _) => u }.forall(_ == "m"))
    assert(rows.collect { case ("click", u, _) => u }.forall(_ == "l/s"))
    assert(rows.map(_._3).distinct.toSeq === Seq("synthetic-generator"))
  }

  test("v_data_lineage synthesizes batch-grain lineage deterministically") {
    val rows = sql(
      """SELECT unified_batch_id, pipeline_version, CAST(batch_day AS STRING)
         FROM v_data_lineage""").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, ver, day) =>
      assert(id === s"batch_$day", "one id per batch-day, derived from it")
      assert(ver === "1.0")
    }
    // one batch per day — the id is a key at this grain
    assert(rows.map(_._1).distinct.length === rows.length)
  }
}
