package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier detection: z-score, modified z-score (median/MAD) and the
  * recursive Grubbs test (delegated to [[Grubbs]]).
  *
  * Reference semantics (`/root/reference/statistics/grubbs.py`):
  *  - Zscore driver `:459-490`, per-window recursive test `:760-827`.
  *  - Modified z-score `|x−med|/MAD ≥ m` `:745-756`.
  *  - Sliding half-overlapping window sweep `:889-918` (stride = window/2).
  *
  * Scale shape: per-key statistics are computed with a `groupBy`
  * aggregate (map-side partial aggregation → tiny shuffle: one row per
  * key) and joined back with NO forced broadcast — AQE broadcasts the
  * agg side at runtime when it is small and falls back to a shuffle join
  * at extreme key cardinality. This beats a whole-key window (which
  * sort-shuffles every data row) and beats a forced broadcast (which
  * dies when keys × row-size exceeds driver memory) — ADVICE r1.
  */
object Outliers {

  /** Rows with |v − mean| / stddev > c per key. */
  def zscoreOutliers(df: DataFrame, key: Column, v: Column, c: Double): DataFrame = {
    val stats = df.groupBy(key.as("__k"))
      .agg(avg(v).as("__mu"), stddev_samp(v).as("__sigma"))
    df.join(stats, key === col("__k"))
      .withColumn("z", (v - col("__mu")) / col("__sigma"))
      .where(abs(col("z")) > c)
      .drop("__k", "__mu", "__sigma")
  }

  /** Modified z-score outliers: |x−median| / median(|x−median|) >= m
    * (`grubbs.py:745-756`). Two aggregate passes (median, then MAD) —
    * each a one-row-per-key shuffle. */
  def madOutliers(df: DataFrame, key: Column, v: Column, m: Double): DataFrame = {
    val med = df.groupBy(key.as("__k")).agg(median(v).as("__med"))
    val withDev = df.join(med, key === col("__k"))
      .withColumn("adev", abs(v - col("__med")))
    val mad = withDev.groupBy(col("__k").as("__k2")).agg(median(col("adev")).as("__mad"))
    withDev.join(mad, col("__k") === col("__k2"))
      .where(col("adev") / col("__mad") >= m)
      .drop("__k", "__k2", "__med", "__mad", "adev")
  }

  // ---- Grubbs (see operators/Grubbs.scala for the aggregator) ----

  /** Grubbs critical z for sample size n (one-sided max test,
    * `grubbs.py:792-800`). */
  private[graft] def grubbsCritical(n: Int, alpha: Double): Double =
    if (n < 3) Double.PositiveInfinity
    else graft.functions.Stats.grubbsCritical(n, alpha)

  /** Kept [min,max] range after the recursive Grubbs sweep (min window
    * 15 per FilterShow.py:450). */
  private[graft] def grubbsRange(values: Array[Double], alpha: Double): (Double, Double) = {
    val r = Grubbs.test(values, alpha, 15)
    (r.lo, r.hi)
  }

  /** Grubbs kept-range per key over half-overlapping sliding windows
    * (`grubbs.py:889-918` FindOutliers), one row per (key, window). */
  def grubbsSweep(df: DataFrame, key: Column, ts: Column, v: Column,
                  windowSec: Long, alpha: Double = 0.05): DataFrame = {
    df.groupBy(key, window(ts, s"$windowSec seconds", s"${windowSec / 2} seconds"))
      .agg(Grubbs.grubbs(v, alpha, 15).as("g"))
      .select(key, unix_timestamp(col("window.start")).as("win_start"),
        col("g.lo").as("keep_lo"), col("g.hi").as("keep_hi"))
  }
}
