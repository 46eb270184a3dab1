package graft

import org.apache.spark.sql.functions._

/** Testdata-schema canary: the driver has re-encoded the testdata once
  * between rounds (events.ts went from INT64 TIMESTAMP(NANOS) to native
  * timestamp[us]), which broke 54 batch queries at analysis and
  * silently corrupted 8 streaming oracles before it was caught. This
  * spec makes the NEXT drift fail one readable test instead of 60
  * queries: it pins the loaded schema of all 10 tables and the
  * normalized events time range.
  */
class SchemaCanarySpec extends SparkSpec {

  /** Loaded (post-parquet-conversion) schemas, as `Tables.load` sees
    * them. `events.ts` is asserted separately — it is the one column
    * with two accepted physical layouts (see `Tables.events`).
    */
  private val expected = Map(
    "region" -> "struct<r_regionkey:int,r_name:string>",
    "nation" -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer" -> ("struct<c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string>"),
    "supplier" -> ("struct<s_suppkey:bigint,s_name:string,s_nationkey:int," +
      "s_acctbal:double>"),
    "part" -> ("struct<p_partkey:bigint,p_name:string,p_brand:string," +
      "p_type:string,p_size:int,p_retailprice:double>"),
    "orders" -> ("struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string,o_totalprice:double," +
      "o_orderdate:timestamp_ntz,o_orderpriority:string>"),
    "lineitem" -> ("struct<l_orderkey:bigint,l_partkey:bigint," +
      "l_suppkey:bigint,l_linenumber:int,l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_tax:double," +
      "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>"),
    "documents" -> ("struct<doc_id:bigint,text:string,lang:string," +
      "source:string,n_chars:bigint>"),
    "embeddings" -> "struct<vec_id:bigint,embedding:array<float>,label:int>")

  test("all non-events tables load with the pinned schema") {
    // both the spec SF and the driver's gate SF — a re-encode could in
    // principle land on one and not the other (footer reads only, cheap)
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01"); (name, want) <- expected) {
      val got = Tables.load(spark, sf, name).schema.simpleString
      assert(got == want,
        s"\nTESTDATA SCHEMA DRIFT on '$name' at $sf:\n  loaded   $got\n" +
          s"  expected $want\nIf the driver re-encoded the testdata, " +
          "update the loaders (Tables.scala) and this canary together.")
    }
  }

  test("events loads with a known ts layout and normalizes to timestamp_ntz") {
    // two accepted physical layouts for ts (see Tables.events); anything
    // else is drift and must fail HERE, not at 60 query sites
    val rawTs = Tables.loadEventsAdaptive(spark, s"$sf0001/events.parquet")
      .schema("ts").dataType.simpleString
    assert(rawTs == "timestamp_ntz" || rawTs == "timestamp" || rawTs == "bigint",
      s"TESTDATA SCHEMA DRIFT: events.ts loads as $rawTs — not one of the " +
        "two layouts Tables.events normalizes (native timestamp / " +
        "INT64-nanos-as-long). Extend Tables.events AND Streams.readEvents.")
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType.simpleString == "timestamp_ntz")
    assert(ev.schema.simpleString ==
      "struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint," +
        "event_type:string,value:double,props:string>")
  }

  test("the modern µs layout leaks no legacy conf into the session") {
    // loadEventsAdaptive sets spark.sql.legacy.parquet.nanosAsLong only
    // on the NANOS rejection; with the native-µs layout the session
    // conf must stay untouched (the old unconditional set leaked a
    // legacy flag into every subsequent parquet read)
    assume(Tables.events(spark, sf0001).schema("ts")
      .dataType.simpleString == "timestamp_ntz")
    if (Tables.load(spark, sf0001, "events")
        .schema("ts").dataType.simpleString != "bigint")
      assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .forall(_ == "false"),
        "nanosAsLong leaked into the session on the non-NANOS layout")
  }

  test("normalized events timestamps land in the fixture's real epoch") {
    // the r8 failure mode: a silently-wrong unit lands every ts in ~1970
    // (÷1000 of µs) or ~year 58000 (×1000 of ns) — a one-row year check
    // kills the whole silent-time-travel class
    val yrs = Tables.events(spark, sf0001)
      .agg(year(min("ts")).as("lo"), year(max("ts")).as("hi")).head()
    assert(yrs.getInt(0) >= 2020 && yrs.getInt(1) <= 2035,
      s"events.ts normalized into [${yrs.getInt(0)}, ${yrs.getInt(1)}] — " +
        "outside the fixture's real epoch; a loader unit fixup is wrong")
  }
}
