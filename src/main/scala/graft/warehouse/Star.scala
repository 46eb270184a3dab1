package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kimball star-schema building blocks (ref: sql/dimensional_schema.sql,
  * warehouse_loader.py — SURVEY §1.2, §3.2).
  *
  * Design notes for scale:
  *  - Dimensions are small by definition → surrogate keys via
  *    dense_rank over the natural key are fine (single-partition window
  *    on the *dim*, never on the fact).
  *  - Fact FK resolution is broadcast equi-joins — the idiomatic-Spark
  *    rewrite of the reference's O(n·m) pandas row loop
  *    (warehouse_loader.py:257-286, J7).
  *  - The date dimension is generated with sequence+explode, not a
  *    driver loop (warehouse_loader.py:85-118).
  */
object Star {

  /** Calendar dimension spanning [minDate, maxDate] of `dates`.
    * Spark dayofweek is Sunday=1; fiscal year starts in April (UK-style,
    * mirroring the reference's fiscal arithmetic,
    * warehouse_loader.py:96-108).
    */
  def buildDimDate(datesSpanning: DataFrame, dateCol: String): DataFrame =
    datesSpanning
      .agg(min(to_date(col(dateCol))).as("d0"), max(to_date(col(dateCol))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("date_actual"))
      .select(
        col("date_actual"),
        (year(col("date_actual")) * 10000 + month(col("date_actual")) * 100 +
          dayofmonth(col("date_actual"))).cast("long").as("time_key"),
        year(col("date_actual")).cast("long").as("y"),
        month(col("date_actual")).cast("long").as("m"),
        dayofmonth(col("date_actual")).cast("long").as("dom"),
        dayofweek(col("date_actual")).cast("long").as("dow_sun1"),
        date_format(col("date_actual"), "EEEE").as("day_name"),
        date_format(col("date_actual"), "MMMM").as("month_name"),
        weekofyear(col("date_actual")).cast("long").as("iso_week"),
        quarter(col("date_actual")).cast("long").as("q"),
        dayofweek(col("date_actual")).isin(1, 7).cast("int").as("is_weekend"),
        when(month(col("date_actual")).isin(12, 1, 2), "Winter")
          .when(month(col("date_actual")).isin(3, 4, 5), "Spring")
          .when(month(col("date_actual")).isin(6, 7, 8), "Summer")
          .otherwise("Autumn").as("season"),
        when(month(col("date_actual")) >= 4, year(col("date_actual")))
          .otherwise(year(col("date_actual")) - 1).cast("long").as("fiscal_year"),
        (pmod(month(col("date_actual")) - 4, lit(12)).cast("long") / 3 + 1)
          .cast("long").as("fiscal_quarter"))

  /** Deterministic surrogate key: dense_rank over the natural key.
    * Dim-only (small); facts never pass through this window — the
    * global single-partition Window would serialize them. Guarded by
    * Catalyst plan-size statistics (metadata-only, no scan): a fact
    * table trips the require instead of silently funneling through one
    * task.
    */
  def withSurrogateKey(dim: DataFrame, keyName: String, naturalKey: Column*): DataFrame = {
    val est = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    require(est <= (1L << 30),
      s"withSurrogateKey is dim-only: input estimates $est bytes (> 1 GiB); " +
        "a global dense_rank window over a fact serializes to one task")
    dim.withColumn(keyName,
      dense_rank().over(Window.orderBy(naturalKey: _*)).cast("long"))
  }

  /** SCD Type 2 merge: close changed rows, append new versions.
    * `updates` rows are assumed changed (caller pre-filters attribute
    * equality). The reference carries SCD2 columns but never performs
    * the merge (SURVEY §1.5) — this implements it.
    */
  def scd2Merge(
      current: DataFrame,
      updates: DataFrame,
      key: String,
      effectiveDate: String): DataFrame = {
    val keys = updates.select(key).distinct()
    val closed = current.join(keys, Seq(key), "left_semi")
      .withColumn("end_date", lit(effectiveDate).cast("date"))
      .withColumn("is_current", lit(0))
    val untouched = current.join(keys, Seq(key), "left_anti")
    val fresh = updates
      .withColumn("effective_date", lit(effectiveDate).cast("date"))
      .withColumn("end_date", lit(null).cast("date"))
      .withColumn("is_current", lit(1))
    untouched.unionByName(closed).unionByName(fresh)
  }
}
