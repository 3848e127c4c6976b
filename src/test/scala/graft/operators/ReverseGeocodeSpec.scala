package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GeoFunctions

/** Offline reverse geocoding (MyDatacollector.py:1041-1078 /
  * MyGPS.py:155-176): nearest gazetteer place within radius via the
  * geohash-cell broadcast join, exactness at cell boundaries, NULL on
  * out-of-range, deterministic tie-break. */
class ReverseGeocodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def geocode(pts: Seq[(Long, Double, Double)],
                      places: Seq[(Long, Double, Double)],
                      radiusM: Double): Map[Long, Option[(Long, Double)]] = {
    import spark.implicits._
    val out = ReverseGeocode.nearestWithinRadius(
      pts.toDF("k", "lat", "lon"), col("k"), col("lat"), col("lon"),
      places.toDF("pk", "plat", "plon"), col("pk"), col("plat"), col("plon"),
      radiusM, maxAbsLat = 60.0)
    out.collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None
                       else Some((r.getLong(1), r.getDouble(2))))
    }.toMap
  }

  test("picks the true nearest place; out-of-range points get NULL") {
    // place 20 is ~111 m north of point 1; place 21 is ~222 m north.
    val res = geocode(
      pts = Seq((1L, 51.0, 6.0), (2L, 52.0, 7.0)),
      places = Seq((20L, 51.001, 6.0), (21L, 51.002, 6.0)),
      radiusM = 500.0)
    val (pk, d) = res(1L).get
    assert(pk == 20L && math.abs(d - 111.2) < 1.0)
    assert(res(2L).isEmpty) // nothing within 500 m of point 2
  }

  test("exact across cell boundaries: nearest place in a neighbor cell wins") {
    // Radius 5000 m → precision picks cells wider than 5 km; put the
    // point right at a cell edge and the nearest place across it. A
    // brute-force check over every place must agree with the blocked join.
    val pts = (0 until 40).map(i => (i.toLong, 50.0 + i * 0.011, 5.99 + (i % 7) * 0.003))
    val places = (0 until 200).map(j => (1000L + j, 50.0 + (j % 45) * 0.0103, 5.97 + (j % 11) * 0.0041))
    val got = geocode(pts, places, radiusM = 5000.0)
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val dLat = math.toRadians(b._1 - a._1) / 2
      val dLon = math.toRadians(b._2 - a._2) / 2
      val h = math.pow(math.sin(dLat), 2) +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
          math.pow(math.sin(dLon), 2)
      2 * 6371000.0 * math.asin(math.min(1.0, math.sqrt(h)))
    }
    pts.foreach { case (k, la, lo) =>
      val inRange = places.map { case (pk, pla, plo) =>
        (pk, hav((la, lo), (pla, plo)))
      }.filter(_._2 <= 5000.0)
      val expect = if (inRange.isEmpty) None
        else Some(inRange.minBy { case (pk, dm) => (dm, pk) })
      (got(k), expect) match {
        case (None, None) =>
        case (Some((gpk, gd)), Some((epk, ed))) =>
          assert(gpk == epk, s"point $k: got place $gpk, expected $epk")
          assert(math.abs(gd - ed) < 0.01)
        case other => fail(s"point $k: $other")
      }
    }
  }

  test("distance ties break towards the lowest place key") {
    // two places exactly symmetric east/west of the point → equal distance
    val res = geocode(
      pts = Seq((1L, 51.0, 6.0)),
      places = Seq((31L, 51.0, 6.001), (30L, 51.0, 5.999)),
      radiusM = 500.0)
    assert(res(1L).get._1 == 30L)
  }

  test("plan broadcasts the gazetteer side") {
    import spark.implicits._
    val out = ReverseGeocode.nearestWithinRadius(
      Seq((1L, 51.0, 6.0)).toDF("k", "lat", "lon"),
      col("k"), col("lat"), col("lon"),
      Seq((2L, 51.0, 6.0)).toDF("pk", "plat", "plon"),
      col("pk"), col("plat"), col("plon"), 500.0)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
