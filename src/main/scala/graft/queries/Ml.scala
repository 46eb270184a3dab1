package graft.queries

import graft.{QueryDef, Tables}
import graft.ml.Analytics

/** MLlib operator surface (SURVEY §2.11 M1–M8). Model fits are not
  * SQL-expressible, so these are rows-only-checked by the driver (no
  * oracle SQL) — determinism comes from pinned seeds (42) instead.
  */
object Ml {

  /** M1+M3+A5: KMeans over embeddings → cluster sizes + inertia. */
  val clusterSummary = QueryDef(
    "q_ml_cluster_summary",
    (s, d) => Analytics.clusterSummary(Tables.embeddings(s, d), k = 10),
    None)

  /** M2: assembler+scaler sanity — per-feature scaled mean≈0 / std≈1. */
  val scaledStats = QueryDef(
    "q_ml_scaled_stats",
    (s, d) => Analytics.scaledFeatureStats(Tables.events(s, d)),
    None)

  /** M8 fixed (F3): distance-to-centroid anomaly tag, top 5%. */
  val anomalyTag = QueryDef(
    "q_ml_anomaly_tag",
    (s, d) => Analytics.anomalyTag(Tables.embeddings(s, d), k = 10)
      .groupBy("is_ml_anomaly")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n")),
    None)

  /** M4+M5+M6: assembler→RF pipeline forecasting next-hour event count,
    * RMSE on a deterministic 80/20 time split.
    */
  val forecastRmse = QueryDef(
    "q_ml_forecast_rmse",
    (s, d) => Analytics.forecastRmse(Tables.events(s, d)),
    None)

  def all: Seq[QueryDef] = Seq(clusterSummary, scaledStats, anomalyTag, forecastRmse)
}
