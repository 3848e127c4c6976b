package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Grubbs

/** ScalaCheck properties from the SURVEY §5 test plan: geohash
  * round-trip, haversine metric axioms, Taylor linearity, Grubbs
  * monotonicity, t-distribution sanity, minhash range. Pure JVM — no
  * Spark session. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genLat = Gen.chooseNum(-89.999, 89.999)
  private val genLon = Gen.chooseNum(-179.999, 179.999)

  test("geohash round-trip error is bounded by precision") {
    check(Prop.forAll(genLat, genLon) { (lat, lon) =>
      val gh = GeoFunctions.geohashEncode(lat, lon, 11)
      val (la, lo) = GeoFunctions.geohashDecode(gh)
      math.abs(la - lat) < 1e-4 && math.abs(lo - lon) < 1e-4
    })
    check(Prop.forAll(genLat, genLon) { (lat, lon) =>
      val gh = GeoFunctions.geohashEncode(lat, lon, 6)
      val (la, lo) = GeoFunctions.geohashDecode(gh)
      math.abs(la - lat) < 0.003 && math.abs(lo - lon) < 0.006
    })
  }

  test("geohash prefix length shrinks with distance (containment)") {
    check(Prop.forAll(genLat, genLon) { (lat, lon) =>
      val g11 = GeoFunctions.geohashEncode(lat, lon, 11)
      val g6 = GeoFunctions.geohashEncode(lat, lon, 6)
      g11.startsWith(g6)
    })
  }

  test("haversine is a metric: symmetry, identity, triangle inequality") {
    val h = (a: (Double, Double), b: (Double, Double)) => {
      // JVM-side mirror of GeoFunctions.haversineM's formula
      val dLat = math.toRadians(b._1 - a._1)
      val dLon = math.toRadians(b._2 - a._2)
      val s = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
          math.pow(math.sin(dLon / 2), 2)
      // same clamp as GeoFunctions.haversineM: s can exceed 1.0 by an ulp
      // near antipodes, where asin would return NaN
      2 * 6371000.0 * math.asin(math.min(math.sqrt(s), 1.0))
    }
    val genP = Gen.zip(genLat, genLon)
    check(Prop.forAll(genP, genP) { (a, b) =>
      math.abs(h(a, b) - h(b, a)) < 1e-6
    })
    check(Prop.forAll(genP)(a => h(a, a) == 0.0))
    // ~1 m tolerance: floating-point haversine near antipodes legitimately
    // violates the exact inequality (found by ScalaCheck at
    // (-89.999,179.999)/(89.999,0.0) via a midpoint)
    check(Prop.forAll(genP, genP, genP) { (a, b, c) =>
      h(a, c) <= h(a, b) + h(b, c) + 1.0
    })
  }

  test("Grubbs: the kept envelope never widens when data shrinks inward") {
    val genVals = Gen.listOfN(40, Gen.chooseNum(0.0, 100.0))
    check(Prop.forAll(genVals) { vs =>
      val r = Grubbs.test(vs.toArray, 0.05, 15)
      val r2 = Grubbs.test(vs.filter(v => v >= r.lo && v <= r.hi).toArray, 0.05, 15)
      // re-testing the kept set can only tighten (or keep) the envelope
      r2.lo >= r.lo - 1e-12 && r2.hi <= r.hi + 1e-12
    }, n = 100)
  }

  test("Grubbs critical value decreases in alpha, increases in n") {
    check(Prop.forAll(Gen.chooseNum(10, 200)) { n =>
      Stats.grubbsCritical(n, 0.01) > Stats.grubbsCritical(n, 0.10)
    })
    check(Prop.forAll(Gen.chooseNum(10, 190)) { n =>
      Stats.grubbsCritical(n + 10, 0.05) > Stats.grubbsCritical(n, 0.05)
    })
  }

  test("t survival function: bounds, midpoint, monotonicity") {
    val genDf = Gen.chooseNum(1.0, 200.0)
    val genT = Gen.chooseNum(0.0, 50.0)
    check(Prop.forAll(genDf)(df => math.abs(Stats.tSf(0.0, df) - 0.5) < 1e-12))
    check(Prop.forAll(genDf, genT, genT) { (df, t1, t2) =>
      val (lo, hi) = (math.min(t1, t2), math.max(t1, t2))
      Stats.tSf(hi, df) <= Stats.tSf(lo, df) + 1e-12
    })
    check(Prop.forAll(genDf, genT) { (df, t) =>
      val s = Stats.tSf(t, df)
      s >= 0.0 && s <= 0.5
    })
  }

  test("Taylor/Horner evaluation is linear in the coefficients") {
    import org.apache.spark.sql.functions.lit
    val spark = graft.TestSpark.spark
    def eval(cs: Seq[Double], x: Double): Double =
      spark.range(1).select(Calibration.taylor(lit(x), cs).cast("double"))
        .head.getDouble(0)
    val genC = Gen.listOfN(3, Gen.chooseNum(-5.0, 5.0))
    val genX = Gen.chooseNum(-10.0, 10.0)
    check(Prop.forAll(genC, genC, genX) { (a, b, x) =>
      val sum = a.zip(b).map { case (p, q) => p + q }
      math.abs(eval(sum, x) - (eval(a, x) + eval(b, x))) < 1e-6
    }, n = 20) // Spark-backed: keep the sample small
  }

  test("minhash permutations stay within [0, 2^31-1) for 32-bit hashes") {
    check(Prop.forAll(Gen.chooseNum(0L, (1L << 32) - 1), Gen.chooseNum(0, 63)) {
      (h, j) =>
        val v = (h * (2L * j + 1) + 97L * j + 13) % 2147483647L
        v >= 0 && v < 2147483647L
    })
  }
}
