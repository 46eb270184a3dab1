package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column ↔ Expression converters.
  *
  * Spark 4 made `Column` carry a `ColumnNode` instead of a catalyst
  * `Expression`, and the converters (`classic.ExpressionUtils`) are
  * `private[sql]`. Custom catalyst expressions (graft.plans.VecDot)
  * still need to become `Column`s, so this one-object shim lives in
  * the `org.apache.spark.sql` package — the established extension
  * pattern for Spark-native libraries; no internals are modified.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** True when no Dataset.cache()/persist() entries remain registered —
    * the cache-hygiene assertion (operators must release their staged
    * caches before returning; localCheckpoint blocks are tracked by the
    * ContextCleaner, not the CacheManager, so they don't count).
    */
  def noPinnedCaches(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
