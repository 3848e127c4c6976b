package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GeoFunctionsSpec extends AnyFunSuite {

  test("haversine: one degree of latitude ~ 111.195 km") {
    val spark = TestSpark.spark
    val d = spark.range(1)
      .select(GeoFunctions.haversineM(lit(0.0), lit(0.0), lit(1.0), lit(0.0)))
      .head.getDouble(0)
    assert(math.abs(d - 111194.9) < 1.0)
  }

  test("haversine: symmetric, zero on identical points, Amsterdam-Paris ~430km") {
    val spark = TestSpark.spark
    val row = spark.range(1).select(
      GeoFunctions.haversineM(lit(52.37), lit(4.89), lit(48.86), lit(2.35)).as("ab"),
      GeoFunctions.haversineM(lit(48.86), lit(2.35), lit(52.37), lit(4.89)).as("ba"),
      GeoFunctions.haversineM(lit(48.86), lit(2.35), lit(48.86), lit(2.35)).as("aa")
    ).head
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-9)
    assert(math.abs(row.getDouble(0) / 1000.0 - 430) < 5)
    assert(row.getDouble(2) == 0.0)
  }

  test("geohash: known encoding round-trips") {
    // Golden cross-checked against the canonical (57.64911, 10.40744) ->
    // "u4pruydqqvj" example and an independent reimplementation.
    assert(GeoFunctions.geohashEncode(57.64911, 10.40744, 11) == "u4pruydqqvj")
    assert(GeoFunctions.geohashEncode(52.37, 4.89, 7) == "u173zm8")
    val (lat, lon) = GeoFunctions.geohashDecode("u173zm8")
    assert(math.abs(lat - 52.37) < 0.01 && math.abs(lon - 4.89) < 0.01)
  }

  test("geohash: encode/decode round-trip within cell size (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val lat = rnd.nextDouble() * 179.8 - 89.9
      val lon = rnd.nextDouble() * 359.8 - 179.9
      val gh = GeoFunctions.geohashEncode(lat, lon, 10)
      val (dLat, dLon) = GeoFunctions.geohashDecode(gh)
      // precision-10 cell is ~1.2m x 0.6m; decode returns the cell centre
      assert(math.abs(dLat - lat) < 1e-4, s"lat $lat -> $gh -> $dLat")
      assert(math.abs(dLon - lon) < 1e-4, s"lon $lon -> $gh -> $dLon")
    }
  }

  test("geohash prefix distance: longer shared prefix means closer") {
    val a = GeoFunctions.geohashEncode(52.37, 4.89, 10)
    val near = GeoFunctions.geohashEncode(52.3700001, 4.8900001, 10)
    val far = GeoFunctions.geohashEncode(-33.0, 151.0, 10)
    assert(GeoFunctions.geohashPrefixDistanceM(a, near) <
      GeoFunctions.geohashPrefixDistanceM(a, far))
    assert(GeoFunctions.geohashPrefixDistanceM(a, a) == 0.6)
  }
}
