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

  def all: Seq[QueryDef] = Seq(piiMask, kanonAudit, ldivAudit)
}
