package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form regression statistics.
  *
  * Reference: `statistics/MyRegression.py:758-917` — `np.polyfit(x,y,1)`
  * with R² via residuals and a Pearson² cross-check. For order 1 the fit
  * has the exact closed form `slope = cov(x,y)/var(x)`,
  * `intercept = ȳ − slope·x̄`, `R² = corr²` — all single-pass Spark
  * aggregates (one shuffle on the group key, partial aggregation map-side).
  * Higher orders go through normal equations on (x, x², …) moments.
  */
object RegressionOps {

  /** Per-group simple linear fit y ~ a + b·x. Returns slope (per x unit),
    * intercept and R², each rounded to 4 decimals.
    */
  def linearFit(df: DataFrame, key: Column, x: Column, y: Column,
                slopeScale: Double = 1.0): DataFrame =
    df.groupBy(key).agg(
      count(lit(1)).as("n"),
      round((covar_samp(x, y) / var_samp(x)) * slopeScale, 4).as("slope"),
      round(avg(y) - (covar_samp(x, y) / var_samp(x)) * avg(x), 4).as("intercept"),
      round(pow(corr(x, y), 2), 4).as("r2"))

  // ---------------------------------------------------- order-n polyfit

  /** Laplace-expansion determinant over a Column matrix (order ≤ 4 ⇒ at
    * most 5×5 = 120 terms; the moment matrices here are ≤ 4×4). */
  private def detC(m: IndexedSeq[IndexedSeq[Column]]): Column =
    if (m.size == 1) m(0)(0)
    else m(0).indices.map { j =>
      val minor = m.tail.map(r => r.indices.filter(_ != j).map(r))
      val t = m(0)(j) * detC(minor)
      if (j % 2 == 0) t else -t
    }.reduce(_ + _)

  /** Identical recursion over SQL strings — the DuckDB twin must expand
    * the same products in the same order so both engines do the same
    * IEEE arithmetic. */
  private def detS(m: IndexedSeq[IndexedSeq[String]]): String =
    if (m.size == 1) m(0)(0)
    else m(0).indices.map { j =>
      val minor = m.tail.map(r => r.indices.filter(_ != j).map(r))
      val t = s"(${m(0)(j)} * ${detS(minor)})"
      if (j % 2 == 0) t else s"(- $t)"
    }.mkString("(", " + ", ")")

  /** x^k as a left-associated product chain — NOT `pow`: java.lang.Math
    * .pow and C libm pow may differ in the last ulp for fractional-free
    * args, while a plain multiply chain is IEEE-identical everywhere. */
  private def xpC(x: Column, k: Int): Column =
    if (k == 0) lit(1.0) else Seq.fill(k)(x).reduce(_ * _)
  private def xpS(x: String, k: Int): String =
    if (k == 0) "1.0" else Seq.fill(k)(x).mkString("(", " * ", ")")

  /** Per-group order-n polynomial least-squares fit — the general
    * `np.polyfit(x, y, order)` of the reference's correlation reports
    * (`statistics/MyRegression.py:863` with order 2-3 via the `order`
    * argument, R² per `get_r2_numpy` `:768-775`:
    * `1 − Σ(y−p(x))² / ((n−1)·var(y, ddof=1))`).
    *
    * Single aggregation pass (map-side combined): power sums
    * `s_k = Σxᵏ (k ≤ 2n)`, `t_k = Σxᵏy (k ≤ n)`, `Σy²`; the
    * (n+1)×(n+1) normal equations are then solved in closed form by
    * Cramer's rule on the aggregated row, and SSE expands over the same
    * sums (`Σy² − 2Σaₖtₖ + Σⱼₖ aⱼaₖ s_{j+k}`) — no second data pass, no
    * driver-side math, no ML-library iteration. Callers should scale x
    * into O(1) (e.g. [-1,1]) — the moment matrix of a raw epoch-seconds
    * x is numerically singular at order ≥ 2.
    *
    * Output: key, n, c0..c{order} (rounded 4), r2 (rounded 4). */
  def polyFit(df: DataFrame, key: Column, x: Column, y: Column,
              order: Int): DataFrame = {
    require(order >= 1 && order <= 4, "polyFit supports order 1..4")
    val sums =
      (1 to 2 * order).map(k => sum(xpC(x, k)).as(s"s$k")) ++
        (0 to order).map(k => sum(xpC(x, k) * y).as(s"t$k")) ++
        Seq(sum(y * y).as("syy"), avg(y).as("ybar"),
          count(lit(1)).cast("double").as("s0"), count(lit(1)).as("n"))
    val g = df.groupBy(key.as("k")).agg(sums.head, sums.tail: _*)
    def s(k: Int): Column = col(s"s$k")
    val m = (0 to order).map(i => (0 to order).map(j => s(i + j)))
    val bv = (0 to order).map(i => col(s"t$i"))
    val d = detC(m)
    val coefs = (0 to order).map(i =>
      detC(m.indices.map(r => m(r).updated(i, bv(r)))) / d)
    val sse = col("syy") -
      lit(2.0) * (0 to order).map(i => coefs(i) * bv(i)).reduce(_ + _) +
      (for (i <- 0 to order; j <- 0 to order)
        yield coefs(i) * coefs(j) * s(i + j)).reduce(_ + _)
    val sst = col("syy") - col("s0") * col("ybar") * col("ybar")
    g.select(col("k") +: col("n") +:
      (0 to order).map(i => round(coefs(i), 4).as(s"c$i")) :+
      round(lit(1.0) - sse / sst, 4).as("r2"): _*)
  }

  /** DuckDB twin of [[polyFit]]: same power sums, same Cramer expansion,
    * same SSE algebra, via CTEs. `from` supplies `(k, x, y)` rows. */
  def polyFitSql(from: String, order: Int): String = {
    val sums =
      (1 to 2 * order).map(k => s"sum(${xpS("x", k)}) AS s$k") ++
        (0 to order).map(k => s"sum(${xpS("x", k)} * y) AS t$k") ++
        Seq("sum(y * y) AS syy", "avg(y) AS ybar",
          "CAST(count(*) AS DOUBLE) AS s0", "count(*) AS n")
    def s(k: Int): String = s"s$k"
    val m = (0 to order).map(i => (0 to order).map(j => s(i + j)))
    val bv = (0 to order).map(i => s"t$i")
    val d = detS(m)
    val coefs = (0 to order).map(i =>
      s"(${detS(m.indices.map(r => m(r).updated(i, bv(r))))} / $d)")
    val cCols = (0 to order).map(i => s"${coefs(i)} AS c$i").mkString(", ")
    val sse = s"(syy - 2.0 * (${(0 to order).map(i => s"(c$i * t$i)").mkString(" + ")}) + " +
      s"(${(for (i <- 0 to order; j <- 0 to order) yield s"(c$i * c$j * ${s(i + j)})").mkString(" + ")}))"
    s"""WITH src AS ($from),
        ps AS (SELECT k, ${sums.mkString(", ")} FROM src GROUP BY k),
        cf AS (SELECT *, $cCols FROM ps)
        SELECT k, n, ${(0 to order).map(i => s"round(c$i, 4) AS c$i").mkString(", ")},
               round(1.0 - $sse / (syy - s0 * ybar * ybar), 4) AS r2
        FROM cf"""
  }

  /** Min-max normalisation of `v` to [0,1] per key
    * (`MyRegression.py:816-836`). Window over the key — one shuffle,
    * no join/broadcast (per-key stats would be one row per key and exceed
    * broadcast limits at high key cardinality).
    */
  def minMaxNorm(df: DataFrame, key: Column, v: Column, as: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
    df.withColumn(as, (v - min(v).over(w)) / (max(v).over(w) - min(v).over(w)))
  }

  /** Z-score normalisation per key; same single-shuffle window shape. */
  def zNorm(df: DataFrame, key: Column, v: Column, as: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
    df.withColumn(as, (v - avg(v).over(w)) / stddev_samp(v).over(w))
  }

  /** Two-feature OLS with stats summary — the statsmodels
    * `OLS(y, [1, x1, x2]).fit()` surface of the reference
    * (`MyRegression.py:847-860,919-967`: params, R², t-values) in closed
    * form via the covariance normal equations:
    *
    *   b1 = (Sy1·S22 − Sy2·S12) / det,  b2 = (Sy2·S11 − Sy1·S12) / det,
    *   det = S11·S22 − S12²,  b0 = ȳ − b1·x̄1 − b2·x̄2,
    *   R²  = (b1·Sy1 + b2·Sy2) / Syy,
    *   tᵢ  = bᵢ / seᵢ,  seᵢ² = σ² / ((n−1)·Sᵢᵢ·(1−r12²)),
    *   σ²  = Syy·(1−R²)·(n−1)/(n−3)
    *
    * One `groupBy` pass of `covar_samp`/`var_samp`/`avg` aggregates (all
    * map-side combined) — no ML-library iteration, no driver math.
    */
  def multiOls(df: DataFrame, key: Column, x1: Column, x2: Column,
               y: Column): DataFrame = {
    val agg = df.groupBy(key).agg(
      count(lit(1)).as("n"),
      avg(y).as("my"), avg(x1).as("m1"), avg(x2).as("m2"),
      var_samp(x1).as("s11"), var_samp(x2).as("s22"),
      covar_samp(x1, x2).as("s12"),
      covar_samp(x1, y).as("sy1"), covar_samp(x2, y).as("sy2"),
      var_samp(y).as("syy"))
    val det = col("s11") * col("s22") - col("s12") * col("s12")
    val b1 = (col("sy1") * col("s22") - col("sy2") * col("s12")) / det
    val b2 = (col("sy2") * col("s11") - col("sy1") * col("s12")) / det
    val r2 = (b1 * col("sy1") + b2 * col("sy2")) / col("syy")
    val sigma2 = col("syy") * (lit(1.0) - r2) * (col("n") - 1) / (col("n") - 3)
    val r12sq = col("s12") * col("s12") / (col("s11") * col("s22"))
    val se1 = sqrt(sigma2 / ((col("n") - 1) * col("s11") * (lit(1.0) - r12sq)))
    val se2 = sqrt(sigma2 / ((col("n") - 1) * col("s22") * (lit(1.0) - r12sq)))
    agg.select(key, col("n"),
      round(col("my") - b1 * col("m1") - b2 * col("m2"), 4).as("b0"),
      round(b1, 4).as("b1"), round(b2, 4).as("b2"),
      round(r2, 4).as("r2"),
      round(b1 / se1, 4).as("t1"), round(b2 / se2, 4).as("t2"))
  }
}
