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
