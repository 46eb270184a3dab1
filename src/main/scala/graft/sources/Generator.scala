package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic sensor-data generator (SURVEY §2.1 S11; ref
  * data_generator.py:8-101: 20 sensors × 5 districts × 4 types × 30
  * days × 24 h = 14,400 readings with diurnal-shaped values and ~2%
  * injected anomalies).
  *
  * Spark-native: one `spark.range` + column expressions — no driver
  * loop, so the same code generates 14 K rows or 14 B rows (the range
  * splits across executors). Noise is derived from a hash of the row id
  * (seed-pinned), NOT `rand()`, so every run and every engine sees the
  * same table.
  */
object Generator {
  val NumSensors = 20
  val Days = 30
  val HoursPerDay = 24
  val Rows: Long = NumSensors.toLong * Days * HoursPerDay // 14,400

  private val districts = Seq("Central", "North", "South", "East", "West")
  private val types = Seq("flow", "pressure", "temperature", "ph")
  private val units = Map("flow" -> "L/min", "pressure" -> "bar",
    "temperature" -> "C", "ph" -> "pH")
  private val base = Map("flow" -> 50.0, "pressure" -> 3.0,
    "temperature" -> 15.0, "ph" -> 7.2)
  private val amp = Map("flow" -> 20.0, "pressure" -> 0.5,
    "temperature" -> 5.0, "ph" -> 0.3)

  /** Uniform [0,1) from the row id — xxhash64 is a pinned-seed Spark
    * builtin, stable across runs/partitionings.
    */
  private def u(seed: Int): org.apache.spark.sql.Column =
    (pmod(xxhash64(col("id"), lit(seed)), lit(1000000L)).cast("double") / 1000000.0)

  /** Core 8-column reading table (SURVEY §1.1) starting 2025-05-01. */
  def readings(spark: SparkSession): DataFrame = {
    val sensorIdx = (col("id") / (Days * HoursPerDay)).cast("int")
    val hourIdx = (col("id") % (Days * HoursPerDay)).cast("int")
    val typeExpr = element_at(
      array(types.map(lit): _*), sensorIdx % types.size + 1)
    val baseExpr = element_at(
      array(types.map(t => lit(base(t))): _*), sensorIdx % types.size + 1)
    val ampExpr = element_at(
      array(types.map(t => lit(amp(t))): _*), sensorIdx % types.size + 1)
    val diurnal = sin((col("hour_of_day") - 6).cast("double") * (2 * math.Pi / 24))
    val isAnomaly = (u(7) < 0.02).cast("int")

    spark.range(Rows)
      .withColumn("sensor_idx", sensorIdx)
      .withColumn("hour_of_day", hourIdx % HoursPerDay)
      .select(
        // 1746057600 = 2025-05-01T00:00:00Z (session TZ is pinned UTC)
        timestamp_seconds(lit(1746057600L) + col("id") % (Days * HoursPerDay) * 3600L)
          .as("timestamp"),
        format_string("SENSOR_%03d", col("sensor_idx")).as("sensor_id"),
        typeExpr.as("sensor_type"),
        element_at(array(districts.map(lit): _*),
          col("sensor_idx") % districts.size + 1).as("district"),
        round(baseExpr + ampExpr * diurnal + (u(3) - 0.5) * ampExpr * 0.4 +
          when(isAnomaly === 1, baseExpr * 2.0).otherwise(0.0), 4).as("value"),
        element_at(map(units.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*),
          typeExpr).as("unit"),
        round(lit(0.8) + u(11) * 0.2, 3).as("quality_score"),
        isAnomaly.as("anomaly_flag"))
  }
}
