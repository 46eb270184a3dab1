package graft.queries

import graft.{QueryDef, Tables}
import graft.validate.{EventRules, Validator}

/** Validation rule-engine surface (F4/F5): per-rule report + severity-
  * weighted overall score, all from one scan of `events`.
  */
object Validation {

  val report = QueryDef(
    "q_validation_report",
    (s, d) => Validator.report(EventRules.enrich(Tables.events(s, d)), EventRules.all),
    Some(s"WITH ${EventRules.enrichDuck}\n" +
      Validator.reportSqlDuck("enriched", EventRules.all))
  )

  val score = QueryDef(
    "q_validation_score",
    (s, d) => Validator.score(EventRules.enrich(Tables.events(s, d)), EventRules.all),
    Some(s"WITH ${EventRules.enrichDuck}\n" +
      Validator.scoreSqlDuck("enriched", EventRules.all))
  )

  /** Distribution-drift audit (PSI — population stability index), the
    * monitor a training-data pipeline runs between the previous
    * snapshot and the current batch before letting it into the mix.
    * Halves here are a deterministic md5 split of events (the same
    * portable-hash split machinery as q_sample_split); three features
    * are audited, covering the three feature shapes:
    *
    *  - `value`: 20 fixed-width bins over the GLOBAL observed range —
    *    fixed-width (not quantile) bins on purpose: edges come from one
    *    1-row min/max agg broadcast back, so binning stays MAP-ONLY at
    *    100 TB (quantile edges would need a sort or a sketch; the
    *    portable-sketch path exists as q_quantile_sketch),
    *  - `hour`: the 24 natural buckets (cyclic feature),
    *  - `event_type`: categorical, buckets = observed categories.
    *
    * PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref) with add-half
    * Laplace smoothing over the feature's observed bin set (k bins) so
    * an empty bin contributes a finite term. Per-bin counts are ONE
    * map-side-combined hash agg over a 3-way explode; the per-feature
    * reduction is a window over ≤ 50 tiny rows. Terms ride
    * DECIMAL(28,18) partials, so the bin-sum is merge-order-free and
    * the oracle hash-matches. Verdict thresholds are the standard
    * 0.1 / 0.25 monitoring bands.
    */
  val driftPsi = QueryDef(
    "q_drift_psi",
    (s, d) => {
      import graft.functions.PortableHash
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      val ev = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("value").isNotNull)
      val half = expr(s"${PortableHash.laneSpark(
        "md5(concat(cast(event_id as string), '#drift'))", 0)} % 100")
      val mm = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      val valueBin = when(col("mx") > col("mn"),
        least(lit(19L), floor((col("value") - col("mn")) * 20.0 /
          (col("mx") - col("mn")))))
        .otherwise(lit(0L)).cast("string")
      val fb = ev.crossJoin(broadcast(mm))
        .withColumn("half", when(half < 50, "ref").otherwise("cur"))
        .select(col("half"), explode(array(
          struct(lit("value").as("feature"), valueBin.as("bin")),
          struct(lit("hour").as("feature"),
            hour(col("ts")).cast("string").as("bin")),
          struct(lit("event_type").as("feature"), col("event_type").as("bin"))))
          .as("e"))
        .select(col("half"), col("e.feature").as("feature"), col("e.bin").as("bin"))
      val counts = fb.groupBy("feature", "bin").agg(
        sum(when(col("half") === "ref", 1L).otherwise(0L)).as("c_ref"),
        sum(when(col("half") === "cur", 1L).otherwise(0L)).as("c_cur"))
      val wf = Window.partitionBy("feature")
      val pr = (col("c_ref").cast("double") + 0.5) /
        (col("n_ref").cast("double") + lit(0.5) * col("k"))
      val pc = (col("c_cur").cast("double") + 0.5) /
        (col("n_cur").cast("double") + lit(0.5) * col("k"))
      counts
        .withColumn("n_ref", sum(col("c_ref")).over(wf))
        .withColumn("n_cur", sum(col("c_cur")).over(wf))
        .withColumn("k", count(lit(1)).over(wf))
        .withColumn("term", ((pc - pr) * log(pc / pr)).cast(DecimalType(28, 18)))
        .groupBy("feature")
        .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
          max(col("k")).as("n_bins"),
          round(sum(col("term")).cast("double"), 6).as("psi"))
        .withColumn("verdict",
          when(col("psi") < 0.1, "stable")
            .when(col("psi") < 0.25, "moderate_drift")
            .otherwise("major_drift"))
    },
    Some {
      import graft.functions.PortableHash
      val h = PortableHash.laneDuck(
        "md5(CAST(event_id AS VARCHAR) || '#drift')", 0)
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                            event_type, value
                     FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
          mm AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM ev),
          hv AS (SELECT *, CASE WHEN """ + h + """ % 100 < 50
                            THEN 'ref' ELSE 'cur' END AS half FROM ev),
          fb AS (
            SELECT half, 'value' AS feature,
                   CAST(CASE WHEN mx > mn
                        THEN LEAST(CAST(19 AS BIGINT),
                          CAST(FLOOR((value - mn) * 20.0 / (mx - mn)) AS BIGINT))
                        ELSE CAST(0 AS BIGINT) END AS VARCHAR) AS bin
            FROM hv CROSS JOIN mm
            UNION ALL
            SELECT half, 'hour', CAST(EXTRACT(HOUR FROM ts) AS VARCHAR) FROM hv
            UNION ALL
            SELECT half, 'event_type', event_type FROM hv),
          c AS (SELECT feature, bin,
                  CAST(SUM(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
                    AS c_ref,
                  CAST(SUM(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
                    AS c_cur
                FROM fb GROUP BY 1, 2),
          t AS (SELECT *,
                  CAST(SUM(c_ref) OVER (PARTITION BY feature) AS BIGINT) AS n_ref,
                  CAST(SUM(c_cur) OVER (PARTITION BY feature) AS BIGINT) AS n_cur,
                  CAST(COUNT(*) OVER (PARTITION BY feature) AS BIGINT) AS k
                FROM c),
          terms AS (SELECT feature, n_ref, n_cur, k,
                  CAST(((CAST(c_cur AS DOUBLE) + 0.5)
                          / (CAST(n_cur AS DOUBLE) + 0.5 * k)
                        - (CAST(c_ref AS DOUBLE) + 0.5)
                          / (CAST(n_ref AS DOUBLE) + 0.5 * k))
                    * LN(((CAST(c_cur AS DOUBLE) + 0.5)
                          / (CAST(n_cur AS DOUBLE) + 0.5 * k))
                       / ((CAST(c_ref AS DOUBLE) + 0.5)
                          / (CAST(n_ref AS DOUBLE) + 0.5 * k)))
                    AS DECIMAL(28,18)) AS term
                FROM t),
          agg AS (SELECT feature, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
                         MAX(k) AS n_bins,
                         ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi
                  FROM terms GROUP BY feature)
          SELECT feature, n_ref, n_cur, n_bins, psi,
                 CASE WHEN psi < 0.1 THEN 'stable'
                      WHEN psi < 0.25 THEN 'moderate_drift'
                      ELSE 'major_drift' END AS verdict
          FROM agg"""
    }
  )

  def all: Seq[QueryDef] = Seq(report, score, driftPsi)
}
