package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RegressionOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-noise dataset; numpy goldens computed with
  //   z = np.polyfit(x, y, order); r2 per MyRegression.get_r2_numpy
  private def noisy = (0 until 21).map { i =>
    val x = (i - 10) / 10.0
    val y = 2.0 + 1.5 * x - 0.8 * x * x + 0.3 * x * x * x +
      ((i * 37) % 11 - 5) * 0.01
    ("k", x, y)
  }.toDF("k", "x", "y")

  test("polyFit order 2 matches np.polyfit coefficients and R²") {
    val r = RegressionOps.polyFit(noisy, col("k"), col("x"), col("y"), 2).head()
    assert(r.getAs[Double]("c0") == 2.0025)
    assert(r.getAs[Double]("c1") == 1.706)
    assert(r.getAs[Double]("c2") == -0.8095)
    assert(r.getAs[Double]("r2") == 0.9961)
  }

  test("polyFit order 3 matches np.polyfit coefficients and R²") {
    val r = RegressionOps.polyFit(noisy, col("k"), col("x"), col("y"), 3).head()
    assert(r.getAs[Double]("c0") == 2.0025)
    assert(r.getAs[Double]("c1") == 1.4805)
    assert(r.getAs[Double]("c2") == -0.8095)
    assert(r.getAs[Double]("c3") == 0.3426)
    assert(r.getAs[Double]("r2") == 0.9992)
  }

  test("polyFit recovers an exact cubic with R² = 1, per group") {
    val df = (1 to 10).flatMap { i =>
      val x = i / 5.0
      Seq(("a", x, 1.0 - 2.0 * x + 0.25 * x * x * x),
        ("b", x, 4.0 + x * x))
    }.toDF("k", "x", "y")
    val out = RegressionOps.polyFit(df, col("k"), col("x"), col("y"), 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("c0") == 1.0 && a.getAs[Double]("c1") == -2.0 &&
      a.getAs[Double]("c2") == 0.0 && a.getAs[Double]("c3") == 0.25)
    assert(a.getAs[Double]("r2") == 1.0)
    val b = out("b")
    assert(b.getAs[Double]("c0") == 4.0 && b.getAs[Double]("c2") == 1.0)
  }
}
