package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.AirQuality

class ForecastSpec extends AnyFunSuite {

  private def one(c: org.apache.spark.sql.Column): Any = {
    val spark = TestSpark.spark
    spark.range(1).select(c.as("v")).collect()(0).get(0)
  }

  test("AQI inverse hits the forward table's segment anchors") {
    // forward(12.1) = 51 (q51's aqiPm25 table), so inverse(51) = 12.1
    assert(one(AirQuality.aqiPm25.inverseColumn(lit(51.0))) == 12.1)
    // segment 0 interior: inverse(25) = 25/ (50/(12.1*0.999)) = 6.0440→6.0
    assert(one(AirQuality.aqiPm25.inverseColumn(lit(25.0))) == 6.0)
    // zero and null mean "no forecast" → null (forecast.pl gap semantics)
    assert(one(AirQuality.aqiPm25.inverseColumn(lit(0.0))) == null)
    assert(one(AirQuality.aqiPm25.inverseColumn(lit(null).cast("double"))) == null)
  }

  test("AQI inverse round-trips through the forward function") {
    val spark = TestSpark.spark
    // For every integer AQI target the forward index of the inverse
    // concentration must land within the forward function's own output
    // rounding (±1 index unit) of the target.
    val df = spark.range(1, 500).select(
      col("id").cast("double").as("i"),
      AirQuality.aqiPm25.column(
        AirQuality.aqiPm25.inverseColumn(col("id").cast("double"))).as("fwd"))
    val bad = df.where(abs(col("fwd") - col("i")) > 1.0).count()
    assert(bad == 0)
  }

  test("LKI classification picks reference colour and quality classes") {
    // lki 1.4: colors_index 1.0 <= 1.4 < 1.5 → #006DF8; quality good
    assert(one(AirQuality.classify(lit(1.4),
      AirQuality.lkiColorIndex, AirQuality.lkiColors)) == "#006DF8")
    assert(one(AirQuality.classify(lit(1.4),
      AirQuality.lkiQualityIndex, AirQuality.lkiQuality)) == "good")
    // below the first live boundary → unknown class
    assert(one(AirQuality.classify(lit(0.01),
      AirQuality.lkiQualityIndex, AirQuality.lkiQuality)) == "unknown")
    // past the last boundary → clamped to the last class (ref IndexErrors)
    assert(one(AirQuality.classify(lit(10.7),
      AirQuality.lkiColorIndex, AirQuality.lkiColors)) == "#A21794")
    assert(one(AirQuality.classify(lit(null).cast("double"),
      AirQuality.lkiQualityIndex, AirQuality.lkiQuality)) == null)
  }

  test("assemble: gap hours are zero-filled into null JSON entries") {
    val spark = TestSpark.spark
    import spark.implicits._
    // loc 0: AQI 51 at hour 0 and hour 2 — hour 1 is a gap.
    val rows = Seq(
      (0L, "2024-01-01 00:30:00", 51.0),
      (0L, "2024-01-01 02:30:00", 51.0))
    val df = rows.toDF("user_id", "ts_s", "value")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"value")
    val out = Forecast.assemble(df, $"user_id", $"ts", $"value").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("hours") == 3)
    // AQI 51 → pm2.5 12.1 → LKI 1 + 2.1/(15*0.999-10) = 1.4212 → 1.4
    assert(r.getAs[String]("pm25_json") == "[12.1,null,12.1]")
    assert(r.getAs[String]("lki_json") == "[1.4,null,1.4]")
    assert(r.getAs[String]("colors_json") == """["#006DF8",null,"#006DF8"]""")
    assert(r.getAs[String]("qual_json") == """["good",null,"good"]""")
    // pm10 proxy 2×mean(12.1) = 24.2 → 814.2 + 0.468·24.2 = 825.5256 → 825.5
    assert(r.getAs[Double]("pm25_from_pm10") == 825.5)
  }

  test("weatherSeries: yr.no JSON round-trip reproduces the hourly values") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      (0L, "2024-01-01 00:30:00", 100.0), (0L, "2024-01-01 00:45:00", 120.0),
      (0L, "2024-01-01 01:30:00", 600.0)) // cloud caps at 100
    val df = rows.toDF("user_id", "ts_s", "value")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"value")
    val out = Forecast.weatherSeries(df, $"user_id", $"ts", $"value").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("start_s") == 1704067200L)
    assert(r.getAs[Long]("hours") == 2)
    // hour 0: avg 110 → temp 11.0, pres 995.5, cloud 22.0
    // hour 1: avg 600 → temp 60.0, pres 1020.0, cloud 100.0 (capped)
    assert(r.getAs[String]("temp_json") == "[11.0,60.0]")
    assert(r.getAs[String]("pressure_json") == "[995.5,1020.0]")
    assert(r.getAs[String]("cloud_json") == "[22.0,100.0]")
  }

  test("assemble matches the DuckDB-twin semantics on real data") {
    val spark = TestSpark.spark
    val out = graft.SparkEntry.queries("q67_forecast_series")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 5)
    // every location spans the same global spine
    assert(rows.map(_.getAs[Long]("start_s")).distinct.length == 1)
    assert(rows.map(_.getAs[Long]("hours")).distinct.length == 1)
  }
}
