package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** PII handling over the `customer` dimension — the privacy surface a
  * training-data pipeline needs before any record leaves the trusted
  * zone. Two halves:
  *
  *  - masking (map-only, codegen'd): direct identifiers are
  *    pseudonymized with a salted keyed hash (deterministic, so the
  *    masked key still joins/groups consistently across tables and
  *    runs), sensitive numerics are generalized into bands;
  *  - audit (one hash-agg): k-anonymity check over the
  *    quasi-identifier combination that survives masking — any group
  *    smaller than k is a re-identification risk and gets flagged.
  *
  * Both are oracle-checked; at 100 TB masking is a narrow per-row
  * transform with zero shuffle and the audit is a standard partial-agg
  * rollup on the quasi-identifier key.
  */
object Privacy {

  /** Salted deterministic pseudonym: md5 keyed with a pipeline salt.
    * NOT reversible, but stable — the same input always maps to the
    * same token, preserving join/group semantics on masked data.
    */
  private val Salt = "graft-pii-v1"

  /** Row-level masking of the customer dimension:
    * name → pseudonym token, account balance → 1000-wide band,
    * natural key → keyed surrogate. Market segment and nation are kept
    * as the (audited) quasi-identifiers.
    */
  val piiMask = QueryDef(
    "q_pii_mask",
    (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          concat(lit("anon-"), substring(
            md5(concat(col("c_name"), lit("#"), lit(Salt))), 1, 12)).as("name_token"),
          (floor(col("c_acctbal") / 1000.0) * 1000).cast("long").as("acctbal_band"),
          col("c_nationkey"),
          col("c_mktsegment")),
    Some(s"""SELECT c_custkey,
             'anon-' || substring(md5(c_name || '#' || '$Salt'), 1, 12) AS name_token,
             CAST(FLOOR(c_acctbal / 1000.0) * 1000 AS BIGINT) AS acctbal_band,
             c_nationkey, c_mktsegment
             FROM customer""")
  )

  /** k-anonymity audit (k = 5) over the post-masking quasi-identifiers
    * (nation, market segment, balance band): group sizes + risk flag.
    * The masked table is safe to release only if no group is flagged.
    */
  val kanonAudit = QueryDef(
    "q_kanon_audit",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          (floor(col("c_acctbal") / 1000.0) * 1000).cast("long").as("acctbal_band"))
        .groupBy("c_nationkey", "c_mktsegment", "acctbal_band")
        .agg(count(lit(1)).as("group_size"))
        .withColumn("at_risk", (col("group_size") < 5).cast("int")),
    Some("""SELECT c_nationkey, c_mktsegment,
            CAST(FLOOR(c_acctbal / 1000.0) * 1000 AS BIGINT) AS acctbal_band,
            COUNT(*) AS group_size,
            CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS at_risk
            FROM customer
            GROUP BY 1, 2, 3""")
  )

  /** l-diversity audit (distinct-l, l = 3) — k-anonymity's required
    * complement: a group can be large (k-safe) yet leak the sensitive
    * attribute anyway when every member shares one value (homogeneity
    * attack: "everyone in this group has balance band 0"). Per
    * quasi-identifier group (nation, segment): size, number of DISTINCT
    * sensitive values (balance band), and the at-risk flag when
    * diversity < l. Same scale shape as the k-audit — one partial-agg
    * rollup on the QI key; countDistinct adds a per-group distinct
    * (two-level hash-agg), still one shuffle.
    */
  val ldivAudit = QueryDef(
    "q_ldiv_audit",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          (floor(col("c_acctbal") / 1000.0) * 1000).cast("long").as("band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("group_size"),
          countDistinct(col("band")).as("l_distinct"))
        .withColumn("at_risk", (col("l_distinct") < 3).cast("int")),
    Some("""SELECT c_nationkey, c_mktsegment,
            COUNT(*) AS group_size,
            COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) * 1000 AS BIGINT))
              AS l_distinct,
            CASE WHEN COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) * 1000
              AS BIGINT)) < 3 THEN 1 ELSE 0 END AS at_risk
            FROM customer
            GROUP BY 1, 2""")
  )

  /** Differentially-private histogram release (ε = 1): per
    * (event_type, day) event counts with Laplace(1/ε) noise — the
    * third leg of the privacy surface after masking and the k/l
    * audits: counts released OUTSIDE the trusted zone must not let an
    * adversary detect one record's presence. Sensitivity is 1 under
    * event-level adjacency (one event lands in exactly one cell);
    * user-level DP would first cap per-user contributions (the
    * [[Sampling]] domain-cap machinery) and scale b by the cap — noted,
    * not done here. `true_count`/`noise` are utility-audit columns; a
    * production release selects only (cell, noisy_count).
    *
    * Determinism (the whole trick): the noise is NOT drawn from an RNG
    * but derived from the cell key — u = md5-uniform(cell) in (0,1),
    * centered v = u − ½, and the inverse Laplace CDF
    * −b·sign(v)·ln(1 − 2|v|) maps it to a Laplace deviate. Same
    * distribution over cells, bit-replayable in DuckDB. ln is the one
    * transcendental: rounded to 9 dp to absorb libm ulp skew, after
    * which `true_count + noise` is a single identical IEEE add — no
    * second rounding anywhere. 1 − 2|v| is never 0 (u = (k+½)/2³²
    * cannot reach 1), so ln never sees 0.
    *
    * Scale shape: one partial-agg shuffle builds the histogram; the
    * noise pass is map-only over the REDUCED table (|types|×|days|
    * rows), so at 100 TB the cost is the count itself.
    */
  val dpCounts = QueryDef(
    "q_dp_counts",
    (s, d) => {
      import graft.functions.PortableHash
      val h = "md5(concat(event_type, '|', cast(day as string), '#dp'))"
      val v = (expr(PortableHash.laneSpark(h, 0)).cast("double") + lit(0.5)) /
        lit(4294967296.0) - lit(0.5)
      val noise = round(-signum(v) * log(lit(1.0) - lit(2.0) * abs(v)), 9)
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("true_count"))
        .withColumn("noise", noise)
        .withColumn("noisy_count", col("true_count") + col("noise"))
    },
    Some {
      import graft.functions.PortableHash
      val h = "md5(event_type || '|' || CAST(day AS VARCHAR) || '#dp')"
      val v = s"((CAST(${PortableHash.laneDuck(h, 0)} AS DOUBLE) + 0.5)" +
        " / 4294967296.0 - 0.5)"
      s"""WITH c AS (
            SELECT event_type,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                   COUNT(*) AS true_count
            FROM events GROUP BY 1, 2),
          n AS (
            SELECT *, ROUND(-SIGN($v) * LN(1.0 - 2.0 * ABS($v)), 9) AS noise
            FROM c)
          SELECT event_type, day, true_count, noise,
                 true_count + noise AS noisy_count
          FROM n"""
    })

  def all: Seq[QueryDef] = Seq(piiMask, kanonAudit, ldivAudit, dpCounts)
}
