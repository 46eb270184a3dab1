package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{VectorFunctions => VF}
import graft.ml.Analytics
import org.apache.spark.sql.functions._

/** MLlib operator surface (SURVEY §2.11 M1–M8). Model FITS (KMeans,
  * RF) are not SQL-expressible and stay rows-only-checked with pinned
  * seeds; the deterministic halves — scaler moments (M2) and
  * distance-to-centroid threshold tagging (M8/F3) — carry full DuckDB
  * oracles.
  */
object Ml {

  /** M1+M3+A5: KMeans over embeddings → cluster sizes + inertia. */
  val clusterSummary = QueryDef(
    "q_ml_cluster_summary",
    (s, d) => Analytics.clusterSummary(Tables.embeddings(s, d), k = 10),
    None)

  /** M2: assembler+scaler — per-feature n / raw min/max (exact) and
    * scaled mean/std, which a correct standardizer pins to 0 / 1
    * (closed-form from exact moments; the oracle states them directly).
    */
  val scaledStats = QueryDef(
    "q_ml_scaled_stats",
    (s, d) => Analytics.scaledFeatureStats(Tables.events(s, d)),
    Some("""WITH f AS (SELECT value AS f0,
                  CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS DOUBLE) AS f1,
                  CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS DOUBLE) AS f2
            FROM events
            WHERE value IS NOT NULL AND ts IS NOT NULL)
            SELECT 0 AS feature_idx, COUNT(*) AS n, MIN(f0) AS raw_min,
                   MAX(f0) AS raw_max, 0.0 AS scaled_mean, 1.0 AS scaled_std FROM f
            UNION ALL
            SELECT 1, COUNT(*), MIN(f1), MAX(f1), 0.0, 1.0 FROM f
            UNION ALL
            SELECT 2, COUNT(*), MIN(f2), MAX(f2), 0.0, 1.0 FROM f"""))

  /** M8 fixed (F3): distance-to-nearest-centroid anomaly tag, top 5%
    * by exact rank threshold — deterministic twin of the KMeans+
    * approxQuantile path (Analytics.anomalyTag), fully oracled.
    */
  val anomalyTag = QueryDef(
    "q_ml_anomaly_tag",
    (s, d) => Analytics.anomalyTagDeterministic(Tables.embeddings(s, d))
      .groupBy("is_ml_anomaly")
      .agg(count(lit(1)).as("n"),
        round(min(col("d2")), 6).as("min_d2"),
        round(max(col("d2")), 6).as("max_d2")),
    Some {
      val d2terms = (0 until VF.Dim).map(i =>
        s"(CAST(e.embedding[${i + 1}] AS DOUBLE) - cvec[${i + 1}]) * " +
          s"(CAST(e.embedding[${i + 1}] AS DOUBLE) - cvec[${i + 1}])")
        .mkString("(", " + ", ")")
      s"""WITH cent AS (
            SELECT label AS cell,
                   array_agg(c ORDER BY pos) AS cvec
            FROM (SELECT label, g.i AS pos,
                    ROUND(CAST(SUM(CAST(CAST(embedding[g.i + 1] AS DOUBLE) AS DECIMAL(28,20))) AS DOUBLE)
                      / COUNT(*), 8) AS c
                  FROM embeddings, generate_series(0, ${VF.Dim - 1}) AS g(i)
                  GROUP BY label, g.i)
            GROUP BY label),
          assigned AS (
            SELECT vec_id, cell, d2 FROM (
              SELECT e.vec_id, cent.cell, $d2terms AS d2,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                        ORDER BY $d2terms, cent.cell) AS rn
              FROM embeddings e CROSS JOIN cent)
            WHERE rn = 1),
          th AS (SELECT MIN(d2) AS thresh FROM
                   (SELECT d2 FROM assigned ORDER BY d2 DESC, vec_id
                    LIMIT (SELECT CAST(CEIL(COUNT(*) * 0.05) AS BIGINT)
                           FROM embeddings)))
          SELECT CASE WHEN d2 >= thresh THEN 1 ELSE 0 END AS is_ml_anomaly,
                 COUNT(*) AS n,
                 ROUND(MIN(d2), 6) AS min_d2,
                 ROUND(MAX(d2), 6) AS max_d2
          FROM assigned CROSS JOIN th
          GROUP BY 1"""
    })

  /** M4+M5+M6: assembler→RF pipeline forecasting next-hour event count,
    * RMSE on a deterministic 80/20 time split.
    */
  val forecastRmse = QueryDef(
    "q_ml_forecast_rmse",
    (s, d) => Analytics.forecastRmse(Tables.events(s, d)),
    None)

  def all: Seq[QueryDef] = Seq(clusterSummary, scaledStats, anomalyTag, forecastRmse)
}
