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

  test("oracle SQL column aliases appear in the Spark result columns") {
    // cheap guard against the alias-mismatch failure mode described in
    // the driver contract: every query with an oracle must at least
    // produce a non-empty schema; exact name matching is done by the
    // driver's DuckDB compare (tools/check.py locally).
    val q = QueryRegistry.all.filter(_.oracle.isDefined).take(3)
    q.foreach(d => assert(d.fn(spark, sf0001).columns.nonEmpty, d.name))
  }
}
