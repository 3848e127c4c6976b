package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AirQualitySpec extends AnyFunSuite {
  private def idx(t: AirQuality.PiecewiseTable, v: Double): Double =
    TestSpark.spark.range(1).select(t.column(lit(v)).cast("double")).head.getDouble(0)

  // Expected values below were computed by hand-running the reference
  // algorithm (AirQualityIndex.py AQI/LKI/CAQI) on each input.
  test("AQI pm2.5: reference anchors (integer result, 0.999 denominators)") {
    assert(idx(AirQuality.aqiPm25, 0.0) == 0.0)
    assert(idx(AirQuality.aqiPm25, 12.0) == 50.0)
    assert(idx(AirQuality.aqiPm25, 35.4) == 100.0)
    assert(idx(AirQuality.aqiPm25, 55.4) == 150.0)
    assert(idx(AirQuality.aqiPm25, 400.0) == 450.0) // top-band extrapolation
    assert(idx(AirQuality.aqiPm25, 9999.0) == 500.0) // capped
    // interior: round(50/(12.1*0.999)*9) = 37 (reference int rounding)
    assert(idx(AirQuality.aqiPm25, 9.0) == 37.0)
  }

  test("AQI pm10 reference anchors") {
    assert(idx(AirQuality.aqiPm10, 54.0) == 49.0) // 50*54/54.945 rounded
    assert(idx(AirQuality.aqiPm10, 154.0) == 100.0)
  }

  test("LKI pm2.5: reference anchors (segment i -> (i, i+1))") {
    assert(idx(AirQuality.lkiPm25, 0.0) == 0.0)
    assert(idx(AirQuality.lkiPm25, 10.0) == 1.0)
    assert(math.abs(idx(AirQuality.lkiPm25, 25.0) - 3.501505) < 1e-5)
    // the trailing 1000 sentinel in LKItable keeps segment 8 usable
    // (clamp :460 only fires at indx>=9): 95 in [90,100) → segment 8's
    // line, 8 + 5/(100*0.999 - 90) = 8.505051
    assert(math.abs(idx(AirQuality.lkiPm25, 95.0) - (8.0 + 5.0 / (100 * 0.999 - 90))) < 1e-9)
    // values in [100,1000) extrapolate segment 8's line per the reference
    // clamp: 8 + 30/9.9 = 11.03 → capped at 11
    assert(idx(AirQuality.lkiPm25, 120.0) == 11.0)
    assert(idx(AirQuality.lkiPm25, 500.0) == 11.0) // capped
  }

  test("CAQI pm10: (180,360) segment interpolates 100-125, cap 120") {
    assert(idx(AirQuality.caqiPm10, 0.0) == 0.0)
    assert(idx(AirQuality.caqiPm10, 25.0) == 25.0)
    assert(idx(AirQuality.caqiPm10, 200.0) == 103.0)
    assert(idx(AirQuality.caqiPm10, 270.0) == 112.0)
    assert(idx(AirQuality.caqiPm10, 359.0) == 120.0) // reference caps at 120
    assert(idx(AirQuality.caqiPm10, 500.0) == 120.0)
  }

  test("CAQI interpolates the RAW concentration (no input rounding)") {
    // 89.4 in [50,90): 50 + (75*0.999-50)/(90*0.999-50)*(89.4-50) = 74.7…
    // → round 75. Input-rounding to 89 would yield 74.
    val expect = math.rint(50 + (75 * 0.999 - 50) / (90 * 0.999 - 50) * (89.4 - 50))
    assert(idx(AirQuality.caqiPm10, 89.4) == expect)
    assert(expect == 75.0)
  }

  test("piecewise tables are monotone non-decreasing (seeded sweep)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val vals = (0 to 600 by 3).map(_.toDouble).toDF("c")
    Seq(AirQuality.aqiPm25, AirQuality.aqiPm10, AirQuality.lkiPm25,
        AirQuality.lkiPm10, AirQuality.caqiPm10).foreach { t =>
      val ys = vals.select(t.column($"c").cast("double")).as[Double].collect()
      ys.sliding(2).foreach { case Array(a, b) =>
        assert(a <= b + 1e-9, s"non-monotone at $a > $b")
      case _ => ()
      }
    }
  }

  test("sqlCase renders the same values as column (DuckDB-oracle parity)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (0 to 200 by 7).map(_.toDouble).toDF("v")
    df.createOrReplaceTempView("aq_parity")
    val viaSql = spark.sql(
      s"SELECT ${AirQuality.aqiPm25.sqlCase("v")} AS i FROM aq_parity ORDER BY i")
      .as[Double].collect()
    val viaCol = df.select(AirQuality.aqiPm25.column($"v").cast("double").as("i"))
      .orderBy($"i").as[Double].collect()
    viaSql.zip(viaCol).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("AQHI: known formula value and cap") {
    val spark = TestSpark.spark
    val v = spark.range(1)
      .select(AirQuality.aqhi(lit(30.0), lit(20.0), lit(10.0)).cast("double"))
      .head.getDouble(0)
    val expect = 1000.0 / 10.4 * ((math.exp(0.000537 * 30) - 1) +
      (math.exp(0.000871 * 20) - 1) + (math.exp(0.000487 * 10) - 1))
    assert(math.abs(v - math.rint(expect * 100) / 100) < 0.01)
    val capped = spark.range(1)
      .select(AirQuality.aqhi(lit(1e5), lit(1e5), lit(1e5)).cast("double"))
      .head.getDouble(0)
    assert(capped == 11.0)
  }
}
