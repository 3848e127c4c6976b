package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar library.
  *
  * Semantics follow the reference implementation (MySense):
  *  - haversine great-circle distance, R = 6 371 000 m
  *    (reference: `lib/MyGPS.py:89-119`, SQL `ST_Distance_Sphere` in
  *    `scripts/UpdateValidity.sh:192`); 118 m is the canonical "kit moved"
  *    threshold (`MyDatacollector.py:1111`).
  *  - geohash base32 encode/decode, precision 10-12
  *    (reference: `lib/MyGPS.py:40-54`).
  *  - matching-geohash-prefix-length → approximate distance lookup
  *    (reference: `lib/MyGPS.py:58-79`).
  *
  * Everything here is a pure `Column` expression built from codegen'd
  * built-ins (no UDF boxing in the hot path); geohash codecs are plain
  * Scala functions backing the native Expressions in
  * [[graft.plans.GeohashExpressions]].
  */
object GeoFunctions {

  val EarthRadiusM = 6371000.0

  /** Great-circle distance in metres between two lat/lon points (degrees).
    * Pure arithmetic + trig -> stays inside whole-stage codegen.
    */
  def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    // Clamp: near-antipodal points can push `a` infinitesimally above 1.0
    // in floating point, where asin returns NaN and the metric axioms
    // break. least(√a, 1) keeps the expression total and codegen'd.
    lit(2 * EarthRadiusM) * asin(least(sqrt(a), lit(1.0)))
  }

  /** Kilometre variant (used by the range-join queries). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversineM(lat1, lon1, lat2, lon2) / 1000.0

  // ---- geohash (scala-side pure functions + udf wrappers) ----

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Encode lat/lon to a geohash string of the given precision. */
  def geohashEncode(lat: Double, lon: Double, precision: Int): String = {
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    val sb = new StringBuilder
    var bit = 0
    var ch = 0
    var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(Base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decode a geohash to the (lat, lon) centre of its cell. */
  def geohashDecode(gh: String): (Double, Double) = {
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    var even = true
    gh.foreach { c =>
      val cd = Base32.indexOf(c.toLower)
      var mask = 16
      while (mask > 0) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if ((cd & mask) != 0) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if ((cd & mask) != 0) latLo = mid else latHi = mid
        }
        even = !even
        mask >>= 1
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  /** Approximate distance (m) implied by the length of the common geohash
    * prefix of two hashes; lookup per reference `lib/MyGPS.py:58-79`.
    */
  private val PrefixDistM: Array[Double] =
    Array(20000000, 5003530, 625441, 123264, 19545, 3803, 610, 118, 19, 3.71, 0.6)

  def geohashPrefixDistanceM(a: String, b: String): Double = {
    val n = a.zip(b).takeWhile { case (x, y) => x == y }.length
    PrefixDistM(math.min(n, PrefixDistM.length - 1))
  }

  /** Column form of the common-prefix length: geohash precision is
    * bounded (≤ 12 chars), so the scan renders as a 12-step CASE cascade
    * that stays inside whole-stage codegen — no UDF. The outermost branch
    * tests the longest prefix, falling through to shorter ones. */
  def geohashCommonPrefixLen(a: Column, b: Column): Column =
    (1 to 12).foldLeft(lit(0)) { (acc, p) =>
      when(substring(a, 1, p) === substring(b, 1, p), lit(p)).otherwise(acc)
    }

  /** Column form of [[geohashPrefixDistanceM]] (F6): prefix length →
    * meters via the `MyGPS.py:58-79` lookup, lengths past the table end
    * clamping to the finest entry. */
  def geohashPrefixDistanceMCol(a: Column, b: Column): Column =
    element_at(array(PrefixDistM.map(lit): _*),
      least(geohashCommonPrefixLen(a, b), lit(PrefixDistM.length - 1)) + 1)

  /** DuckDB rendering of the same lookup for oracle authors: `nExpr` is
    * the (engine-equal) prefix-length expression; lengths ≥ the table's
    * last index fall to the ELSE branch, mirroring the clamp. */
  def prefixDistanceSqlCase(nExpr: String): String =
    PrefixDistM.zipWithIndex.map { case (d, i) =>
      if (i == PrefixDistM.length - 1) s"ELSE $d"
      else s"WHEN ($nExpr) = $i THEN $d"
    }.mkString("CASE ", " ", " END")

  // Column-side geohash goes through the native codegen'd Expressions in
  // graft.plans.GeohashExpressions (geohash_encode / geohash_decode_lat /
  // geohash_decode_lon via call_function) — no UDF wrappers here, so the
  // boxed path can't be picked up by accident.
}
