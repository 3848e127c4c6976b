package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class OutliersSpec extends AnyFunSuite {

  test("grubbsCritical matches published one-sided table (alpha=0.05)") {
    // Published one-sided Grubbs critical values (Grubbs 1969 / NIST)
    assert(math.abs(Outliers.grubbsCritical(10, 0.05) - 2.176) < 0.01)
    assert(math.abs(Outliers.grubbsCritical(20, 0.05) - 2.557) < 0.01)
    assert(math.abs(Outliers.grubbsCritical(30, 0.05) - 2.745) < 0.01)
    assert(Outliers.grubbsCritical(2, 0.05).isPosInfinity)
  }

  test("grubbsRange drops an extreme outlier, keeps a clean sample") {
    val rnd = new scala.util.Random(7)
    val clean = Array.fill(40)(10.0 + rnd.nextGaussian())
    val (lo0, hi0) = Outliers.grubbsRange(clean, 0.05)
    assert(lo0 == clean.min && hi0 == clean.max) // nothing removed

    val dirty = clean :+ 100.0
    val (_, hi1) = Outliers.grubbsRange(dirty, 0.05)
    assert(hi1 < 100.0) // the planted outlier is outside the kept range
  }

  test("grubbsRange monotone: removing the max never raises max-z") {
    // windows below 15 samples are untouched (FilterShow.py:450 min window)
    val small = Array(1.0, 2.0, 3.0, 50.0)
    val (lo, hi) = Outliers.grubbsRange(small, 0.05)
    assert(lo == 1.0 && hi == 50.0)
  }

  test("zscoreOutliers flags only the planted outlier") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 100).map(i => ("k1", i.toLong, 5.0 + rnd.nextGaussian() * 0.1)) :+
      (("k1", 101L, 50.0))
    val df = rows.toDF("key", "id", "v")
    val out = Outliers.zscoreOutliers(df, $"key", $"v", 3.0)
      .select($"id").as[Long].collect()
    assert(out.toSeq == Seq(101L))
  }

  test("madOutliers flags the planted outlier and ignores clean data") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 50).map(i => ("k", i.toLong, (i % 7).toDouble)) :+ (("k", 51L, 1000.0))
    val df = rows.toDF("key", "id", "v")
    val out = Outliers.madOutliers(df, $"key", $"v", 10.0)
      .select($"id").as[Long].collect()
    assert(out.toSeq == Seq(51L))
  }

  test("grubbsSweep returns a kept range per half-overlapping window") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = 1700000000L
    val rnd = new scala.util.Random(3)
    val rows = (0 until 120).map { i =>
      val v = if (i == 60) 500.0 else 20.0 + rnd.nextGaussian()
      ("k", new java.sql.Timestamp((base + i * 60) * 1000L), v)
    }
    val df = rows.toDF("key", "ts", "v")
    val res = Outliers.grubbsSweep(df, $"key", $"ts", $"v", 3600, 0.05)
    val his = res.select(max($"keep_hi")).head.getDouble(0)
    assert(res.count() > 0)
    assert(his < 500.0) // outlier excluded from every window's kept range
  }
}
