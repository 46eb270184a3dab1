package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Concrete connectors for the reference's three public APIs — the
  * exact field transforms of
  * ref: src/enhanced_ingestion.py:179-330,399-430,548-704 (OpenMeteo
  * hourly arrays, EA flood-monitoring stations/readings) and
  * ref: src/openweather_ingestion.py:101-225 (OpenWeather pollutant
  * components) — as [[Rest.Endpoint]] instances over an injectable
  * body fetch (recorded JSON fixtures in tests; [[Rest.HttpFetch]] in
  * production; this sandbox has no egress).
  *
  * Where the reference loops over parsed dicts in Python, these
  * connectors parse the payload ONCE with the engine's JSON reader and
  * do the reshaping declaratively — `arrays_zip`+`posexplode` for
  * OpenMeteo's parallel hourly arrays, `explode` over `items`/`list`
  * for EA/OpenWeather — so the same transform runs distributed when
  * payloads arrive in bulk (a backfill landing thousands of recorded
  * responses) instead of row-at-a-time on the driver.
  *
  * All three produce the §2 landing contract (FIXTURES.md §1/§2):
  * timestamp, sensor_id, sensor_type, district, value, unit,
  * quality_score, anomaly_flag, data_source (+ per-source extras),
  * which is exactly the schema `pipeline.Replay`'s feature →
  * window → gold chain consumes — ConnectorsSpec runs connector
  * landings through that chain unchanged.
  */
object Connectors {

  /** A monitored location (ref: openweather_ingestion.py location
    * dicts / enhanced_ingestion.py:72-93).
    */
  final case class Location(
      name: String, district: String, lat: Double, lon: Double)

  private def parse(spark: SparkSession, body: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(body).toDS())
  }

  // ---------------------------------------------------------------- OpenMeteo

  /** OpenMeteo hourly-array payload → one record per (hour, sensor
    * kind present), mirroring _transform_historical_weather_data
    * (ref: enhanced_ingestion.py:593-653): temperature (°C, anomaly
    * outside [-10, 35]), humidity (%, anomaly outside [10, 95]),
    * precipitation (mm, anomaly > 50); quality 0.98, district Central.
    * The parallel arrays are zipped positionally — the index i is the
    * reference's enumerate counter and feeds the sensor_id suffix.
    */
  def openMeteoTransform(spark: SparkSession, body: String): DataFrame = {
    val raw = parse(spark, body)
      .select(col("hourly.time").as("tm"),
        col("hourly.temperature_2m").as("t2m"),
        col("hourly.relative_humidity_2m").as("rh"),
        col("hourly.precipitation").as("pr"))
    val z = raw.select(posexplode(arrays_zip(
      col("tm"), col("t2m"), col("rh"), col("pr"))).as(Seq("i", "h")))
      .select(col("i"),
        to_timestamp(col("h.tm")).as("timestamp"),
        col("h.t2m").cast("double").as("t"),
        col("h.rh").cast("double").as("rhv"),
        col("h.pr").cast("double").as("prv"))
    def rec(valueCol: String, kind: String, idTag: String, unit: String,
        anomaly: Column): DataFrame =
      z.filter(col(valueCol).isNotNull).select(
        col("timestamp"),
        format_string(s"WX_HIST_${idTag}_%s_%02d",
          date_format(col("timestamp"), "yyyyMMdd"), col("i")).as("sensor_id"),
        lit(kind).as("sensor_type"),
        lit("Central").as("district"),
        col(valueCol).as("value"),
        lit(unit).as("unit"),
        lit(0.98).as("quality_score"),
        anomaly.cast("int").as("anomaly_flag"),
        lit("OpenMeteo_Historical_API").as("data_source"))
    rec("t", "temperature", "TEMP", "°C",
      col("t") > 35 || col("t") < -10)
      .unionByName(rec("rhv", "humidity", "HUMID", "%",
        col("rhv") > 95 || col("rhv") < 10))
      .unionByName(rec("prv", "precipitation", "RAIN", "mm",
        col("prv") > 50))
  }

  def openMeteo(body: => String, priority: Int = 2): Rest.Endpoint =
    Rest.Endpoint("london_weather", priority,
      spark => openMeteoTransform(spark, body))

  // ------------------------------------------------------ Environment Agency

  private val eaReadingsSchema = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("dateTime", StringType),
      StructField("value", DoubleType)))))))

  /** Thames-station predicate (ref: enhanced_ingestion.py:378-397):
    * 'thames' in riverName/catchmentName/label, or reference ending in
    * 'TH'.
    */
  private def isThames: Column =
    lower(coalesce(col("riverName"), lit(""))).contains("thames") ||
      lower(coalesce(col("catchmentName"), lit(""))).contains("thames") ||
      lower(coalesce(col("label"), lit(""))).contains("thames") ||
      coalesce(col("stationReference"), lit("")).endsWith("TH")

  /** Town/label → district (ref: enhanced_ingestion.py:716-737), same
    * first-match order as the reference's keyword chain.
    */
  private def eaDistrict(loc: Column): Column =
    when(loc.contains("central") || loc.contains("westminster") ||
      loc.contains("london"), "Central")
      .when(loc.contains("kingston"), "South")
      .when(loc.contains("reading"), "West")
      .when(loc.contains("windsor") || loc.contains("bray"), "West")
      .otherwise("Thames Valley")

  /** EA flood-monitoring two-stage fetch (ref:
    * enhanced_ingestion.py:322-430): the stations catalog is filtered
    * to Thames stations (first `maxStations` in API order), each
    * station's latest readings are fetched (`readingsFor`, the
    * reference's per-station GET — API-bounded driver loop, ≤
    * maxStations calls), and all (station, payload) pairs are parsed
    * and exploded in ONE distributed pass via from_json.
    */
  def eaFloodTransform(spark: SparkSession, stationsBody: String,
      readingsFor: String => String, maxStations: Int = 10): DataFrame = {
    import spark.implicits._
    val stations = parse(spark, stationsBody)
      .select(posexplode(col("items")).as(Seq("pos", "s")))
      .select(col("pos"), col("s.stationReference").as("stationReference"),
        col("s.label").as("label"), col("s.town").as("town"),
        col("s.riverName").as("riverName"),
        col("s.catchmentName").as("catchmentName"))
      .filter(isThames)
      .orderBy("pos")
      .limit(maxStations)
      .select("stationReference", "label", "town", "catchmentName")
      .collect() // ≤ maxStations rows — the reference's station loop
    val withBodies = stations.toSeq.map { r =>
      (r.getString(0), Option(r.getString(1)).getOrElse("Unknown"),
        Option(r.getString(2)).getOrElse(""),
        Option(r.getString(3)).getOrElse("Unknown"),
        readingsFor(r.getString(0)))
    }.toDF("ref", "label", "town", "catchment", "body")
    withBodies
      .select(col("ref"), col("label"), col("town"), col("catchment"),
        explode(from_json(col("body"), eaReadingsSchema).getField("items"))
          .as("r"))
      .select(
        to_timestamp(col("r.dateTime")).as("timestamp"),
        concat(lit("UK_EA_"), col("ref")).as("sensor_id"),
        lit("water_level").as("sensor_type"),
        eaDistrict(lower(concat_ws(" ", col("town"), col("label"))))
          .as("district"),
        col("r.value").as("value"),
        lit("meters").as("unit"),
        lit(0.95).as("quality_score"),
        lit(0).as("anomaly_flag"),
        lit("UK_Environment_Agency").as("data_source"),
        col("label").as("station_name"),
        col("catchment").as("catchment"))
  }

  def eaFlood(stationsBody: => String, readingsFor: String => String,
      maxStations: Int = 10, priority: Int = 1): Rest.Endpoint =
    Rest.Endpoint("thames_water", priority,
      spark => eaFloodTransform(spark, stationsBody, readingsFor, maxStations))

  // -------------------------------------------------------------- OpenWeather

  /** key → (sensor_type, unit) (ref: openweather_ingestion.py:131-140). */
  val Pollutants: Seq[(String, String)] = Seq(
    "co" -> "carbon_monoxide", "no" -> "nitric_oxide",
    "no2" -> "nitrogen_dioxide", "o3" -> "ozone",
    "so2" -> "sulfur_dioxide", "pm2_5" -> "pm2.5",
    "pm10" -> "pm10", "nh3" -> "ammonia")

  /** OpenWeather air-pollution payload → one AQI record per list item
    * (quality min(1, (6-aqi)/5), anomaly aqi > 4) plus one record per
    * pollutant component present
    * (ref: openweather_ingestion.py:101-160). Components the payload
    * lacks entirely are skipped schema-aware, mirroring the
    * reference's `if key in components`.
    */
  def openWeatherAirTransform(spark: SparkSession, body: String,
      location: Location): DataFrame = {
    val items = parse(spark, body)
      .select(explode(col("list")).as("l"))
      .select(col("l.dt").as("dt"), col("l.main.aqi").as("aqi"),
        col("l.components").as("components"))
    val present = items.schema("components").dataType match {
      case s: StructType => Pollutants.filter(p => s.fieldNames.contains(p._1))
      case _ => Nil
    }
    def base(idPrefix: Column, kind: Column, value: Column, unit: Column,
        qs: Column, anomaly: Column, df: DataFrame): DataFrame =
      df.select(
        timestamp_seconds(col("dt")).as("timestamp"),
        concat(idPrefix, lit(s"_${location.name.toUpperCase}_"), col("dt"))
          .as("sensor_id"),
        kind.as("sensor_type"),
        lit(location.district).as("district"),
        lit(location.name).as("location_name"),
        lit(location.lat).as("latitude"),
        lit(location.lon).as("longitude"),
        value.cast("double").as("value"),
        unit.as("unit"),
        qs.as("quality_score"),
        anomaly.cast("int").as("anomaly_flag"),
        lit("OpenWeatherMap_API").as("data_source"))
    val aqiRows = base(lit("AQ"), lit("air_quality"), col("aqi"), lit("AQI"),
      least(lit(1.0), (lit(6) - col("aqi")).cast("double") / 5.0),
      col("aqi") > 4, items)
    val pollutantRows = present.map { case (key, kind) =>
      base(lit(key.toUpperCase), lit(kind),
        col(s"components.$key"), lit("μg/m³"),
        lit(0.95), lit(0),
        items.filter(col(s"components.$key").isNotNull))
    }
    pollutantRows.foldLeft(aqiRows)(_ unionByName _)
  }

  def openWeatherAir(body: => String, location: Location,
      priority: Int = 3): Rest.Endpoint =
    Rest.Endpoint("london_air_quality", priority,
      spark => openWeatherAirTransform(spark, body, location))
}
