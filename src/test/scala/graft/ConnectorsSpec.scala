package graft

import graft.sources.{Connectors, Rest}
import org.apache.spark.sql.functions._

/** Fixture-backed connectors for the reference's three public APIs:
  * every field transform is proven against recorded JSON payloads
  * (src/test/resources/fixtures), and the landed parquet flows into
  * the pipeline-replay chain's schema unchanged.
  */
class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def eaReadings(ref: String): String =
    s"""{"items": [
         {"dateTime": "2024-06-01T10:15:00Z", "value": 1.25,
          "measure": "http://example/m/$ref"},
         {"dateTime": "2024-06-01T10:30:00Z", "value": 1.31,
          "measure": "http://example/m/$ref"}]}"""

  test("OpenMeteo hourly arrays map to per-sensor records with the " +
      "reference's anomaly rules") {
    val out = Connectors.openMeteoTransform(spark, fixture("openmeteo_hourly.json"))
      .collect().map(r => (r.getAs[String]("sensor_id"),
        r.getAs[String]("sensor_type"), r.getAs[Double]("value"),
        r.getAs[String]("unit"), r.getAs[Int]("anomaly_flag"),
        r.getAs[Double]("quality_score"), r.getAs[String]("district"),
        r.getAs[String]("data_source")))
    // 3 temps (the null hour is skipped) + 4 humidity + 4 precipitation
    assert(out.length === 11)
    val temps = out.filter(_._2 == "temperature").sortBy(_._1)
    assert(temps.map(_._1).toSeq === Seq(
      "WX_HIST_TEMP_20240601_00", "WX_HIST_TEMP_20240601_01",
      "WX_HIST_TEMP_20240601_02"))
    assert(temps.map(_._3).toSeq === Seq(12.3, 36.1, -12.5))
    // anomaly iff t > 35 or t < -10
    assert(temps.map(_._5).toSeq === Seq(0, 1, 1))
    assert(temps.forall(t => t._4 == "°C" && t._6 == 0.98 &&
      t._7 == "Central" && t._8 == "OpenMeteo_Historical_API"))
    val hum = out.filter(_._2 == "humidity").sortBy(_._1)
    assert(hum.map(_._3).toSeq === Seq(55.0, 97.0, 8.0, 60.0))
    assert(hum.map(_._5).toSeq === Seq(0, 1, 1, 0)) // >95 / <10
    assert(hum.forall(_._4 == "%"))
    val rain = out.filter(_._2 == "precipitation").sortBy(_._1)
    assert(rain.map(_._5).toSeq === Seq(0, 1, 0, 0)) // > 50 mm
    assert(rain.forall(_._4 == "mm"))
  }

  test("EA flood: Thames filter, station cap, district mapping, reading join") {
    val fetched = scala.collection.mutable.ArrayBuffer[String]()
    val out = Connectors.eaFloodTransform(spark,
      fixture("ea_stations.json"),
      ref => { fetched += ref; eaReadings(ref) },
      maxStations = 4)
      .collect().map(r => (r.getAs[String]("sensor_id"),
        r.getAs[String]("district"), r.getAs[Double]("value"),
        r.getAs[String]("station_name"), r.getAs[String]("catchment"),
        r.getAs[String]("unit"), r.getAs[Double]("quality_score")))
    // non-Thames 0001AA excluded; first 4 Thames stations in API order,
    // one readings GET each (the reference's per-station loop)
    assert(fetched.toSet === Set("3400TH", "2200TH", "2604TH", "9999XX"))
    assert(out.length === 8) // 2 readings per station
    val byStation = out.groupBy(_._1)
    assert(byStation.keySet === Set("UK_EA_3400TH", "UK_EA_2200TH",
      "UK_EA_2604TH", "UK_EA_9999XX"))
    // district keyword chain, reference order (london beats kingston)
    def district(id: String) = byStation(id).head._2
    assert(district("UK_EA_3400TH") === "South")   // kingston
    assert(district("UK_EA_2200TH") === "Central") // town london
    assert(district("UK_EA_2604TH") === "West")    // windsor
    assert(district("UK_EA_9999XX") === "West")    // reading
    assert(out.forall(r => r._6 == "meters" && r._7 == 0.95))
    assert(out.map(_._3).toSet === Set(1.25, 1.31))
    assert(byStation("UK_EA_3400TH").head._4 === "Kingston Bridge")
    assert(byStation("UK_EA_2604TH").head._5
      === "Thames from Cookham to Datchet")
  }

  test("OpenWeather: AQI row plus one record per pollutant component") {
    val loc = Connectors.Location("London", "Central", 51.5074, -0.1278)
    val out = Connectors.openWeatherAirTransform(spark,
      fixture("openweather_air.json"), loc)
      .collect().map(r => (r.getAs[String]("sensor_id"),
        r.getAs[String]("sensor_type"), r.getAs[Double]("value"),
        r.getAs[Double]("quality_score"), r.getAs[Int]("anomaly_flag"),
        r.getAs[String]("unit")))
    // 2 list items × (1 AQI + 8 pollutants)
    assert(out.length === 18)
    val aqi = out.filter(_._2 == "air_quality").sortBy(_._1)
    assert(aqi.map(_._3).toSeq === Seq(2.0, 5.0))
    // quality = min(1, (6-aqi)/5); anomaly iff aqi > 4
    assert(aqi.map(_._4).toSeq === Seq(0.8, 0.2))
    assert(aqi.map(_._5).toSeq === Seq(0, 1))
    assert(aqi.map(_._1).toSeq === Seq("AQ_LONDON_1717243200",
      "AQ_LONDON_1717246800"))
    val co = out.filter(_._2 == "carbon_monoxide").sortBy(_._1)
    assert(co.map(_._3).toSeq === Seq(201.94, 300.41))
    assert(co.map(_._1).toSeq === Seq("CO_LONDON_1717243200",
      "CO_LONDON_1717246800"))
    assert(co.forall(c => c._4 == 0.95 && c._5 == 0 && c._6 == "μg/m³"))
    assert(out.map(_._2).distinct.length === 9)
    // sensor_type naming follows the reference's pollutant table
    assert(out.map(_._2).toSet.contains("pm2.5"))
  }

  test("connector landings flow through the ingestion sweep and the " +
      "pipeline-replay chain unchanged") {
    val landing = graft.util.TempRoot
      .freshDir("connectors-landing").toString + "/landing"
    val loc = Connectors.Location("London", "Central", 51.5074, -0.1278)
    val endpoints = Seq(
      Connectors.eaFlood(fixture("ea_stations.json"), eaReadings, 4, 1),
      Connectors.openMeteo(fixture("openmeteo_hourly.json"), 2),
      Connectors.openWeatherAir(fixture("openweather_air.json"), loc, 3))
    val breakers = scala.collection.mutable.Map[String, Rest.CircuitBreaker]()
    val sweep = new Rest.Ingestion(endpoints,
      n => breakers.getOrElseUpdate(n, new Rest.CircuitBreaker()))
    val results = sweep.runOnce(spark, landing, "batch-001")
    assert(results.forall(_.status == "ok"), results.toString)
    assert(results.map(r => r.source -> r.rows).toMap ===
      Map("thames_water" -> 8L, "london_weather" -> 11L,
        "london_air_quality" -> 18L))

    val landed = spark.read.parquet(landing)
    assert(landed.count() === 37)
    // the sweep's lineage stamps are present
    assert(landed.columns.toSet.contains("batch_id") &&
      landed.columns.toSet.contains("ingestion_priority"))
    // and the landing feeds the replay chain (features → windows →
    // district-hourly gold) with NO schema adaptation
    val gold = graft.pipeline.Replay.districtHourly(
      graft.pipeline.Replay.withAnomalyScores(
        graft.pipeline.Replay.withFeatures(landed)))
    val rows = gold.collect()
    assert(rows.nonEmpty)
    assert(gold.columns.contains("n_spikes") && gold.columns.contains("peak_volume"))
    // every landed district appears in the gold rollup
    val golds = rows.map(_.getAs[String]("district")).toSet
    assert(Set("Central", "South", "West").subsetOf(golds))
  }
}
