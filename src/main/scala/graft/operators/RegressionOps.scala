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
}
