package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Outlier detection: z-score, modified z-score (median/MAD) and the
  * recursive Grubbs test.
  *
  * Reference semantics (`/root/reference/statistics/grubbs.py`):
  *  - Zscore driver `:459-490`, per-window recursive test `:760-827`:
  *    repeatedly drop the sample farthest from the mean while its z-score
  *    exceeds the Grubbs critical value
  *    `(N−1)/√N · √(t²/(N−2+t²))`, `t = t.isf(α/N, N−2)` (one-sided max),
  *    then invalidate everything outside the kept [min,max].
  *  - Modified z-score `|x−med|/MAD ≥ m` `:745-756`.
  *  - Sliding half-overlapping window sweep `:889-918` (stride = window/2).
  *
  * Grubbs is inherently iterative over a window's sample, so it is packaged
  * as a typed [[Aggregator]]: one shuffle groups each (key, window) sample
  * onto an executor, the loop runs in the merge buffer (windows are at most
  * a few thousand rows in the reference deployment — bounded memory).
  */
object Outliers {

  /** Rows with |v − mean| / stddev > c per key.
    *
    * One shuffle on the key (window aggregate over the whole key
    * partition) — no join, no broadcast. Per-key stats broadcast would be
    * one row *per key* and blow up at high key cardinality; the window
    * keeps stats computation co-partitioned with the rows that need them,
    * which also matches the archive's physical (project,serial)
    * partitioning at cluster scale.
    */
  def zscoreOutliers(df: DataFrame, key: Column, v: Column, c: Double): DataFrame = {
    val w = Window.partitionBy(key)
    df.withColumn("z", (v - avg(v).over(w)) / stddev_samp(v).over(w))
      .where(abs(col("z")) > c)
  }

  /** Modified z-score outliers: |x−median| / median(|x−median|) >= m
    * (`grubbs.py:745-756`). Two window passes over the same key
    * partitioning (median, then MAD) — Spark reuses the exchange.
    */
  def madOutliers(df: DataFrame, key: Column, v: Column, m: Double): DataFrame = {
    val w = Window.partitionBy(key)
    df.withColumn("adev", abs(v - median(v).over(w)))
      .withColumn("mad", median(col("adev")).over(w))
      .where(col("adev") / col("mad") >= m)
      .drop("adev", "mad")
  }

  // ---- Grubbs ----

  /** Student-t inverse survival function via Newton/bisection on the
    * regularized incomplete beta function (standard public formulae;
    * Abramowitz & Stegun 26.5.8 continued fraction).
    */
  private[graft] def tIsf(q: Double, dfree: Double): Double = {
    // survival P(T > t) = 0.5 * I_{df/(df+t^2)}(df/2, 1/2) for t >= 0
    def sf(t: Double): Double = {
      val x = dfree / (dfree + t * t)
      0.5 * regIncBeta(x, dfree / 2.0, 0.5)
    }
    var lo = 0.0
    var hi = 1.0
    while (sf(hi) > q) hi *= 2 // bracket
    var i = 0
    while (i < 200 && hi - lo > 1e-12 * math.max(1.0, hi)) {
      val mid = (lo + hi) / 2
      if (sf(mid) > q) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2
  }

  /** Regularized incomplete beta I_x(a,b) by Lentz continued fraction. */
  private[graft] def regIncBeta(x: Double, a: Double, b: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val lbeta = lgammaD(a) + lgammaD(b) - lgammaD(a + b)
    val front = math.exp(a * math.log(x) + b * math.log(1 - x) - lbeta)
    def cf(x: Double, a: Double, b: Double): Double = {
      val eps = 1e-15
      var c = 1.0
      var d = 1.0 - (a + b) * x / (a + 1)
      if (math.abs(d) < 1e-30) d = 1e-30
      d = 1 / d
      var h = d
      var m = 1
      while (m <= 300) {
        val m2 = 2 * m
        var aa = m * (b - m) * x / ((a + m2 - 1) * (a + m2))
        d = 1 + aa * d; if (math.abs(d) < 1e-30) d = 1e-30
        c = 1 + aa / c; if (math.abs(c) < 1e-30) c = 1e-30
        d = 1 / d; h *= d * c
        aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1))
        d = 1 + aa * d; if (math.abs(d) < 1e-30) d = 1e-30
        c = 1 + aa / c; if (math.abs(c) < 1e-30) c = 1e-30
        d = 1 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1) < eps) return h
        m += 1
      }
      h
    }
    if (x < (a + 1) / (a + b + 2)) front * cf(x, a, b) / a
    else 1 - math.exp(a * 0 + 0) * (regIncBeta(1 - x, b, a)) // symmetry
  }

  private def lgammaD(x: Double): Double = {
    // Lanczos approximation (g=7, n=9) — standard public constants.
    val g = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgammaD(1 - x)
    else {
      val z = x - 1
      var s = g(0)
      var i = 1
      while (i < 9) { s += g(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(s)
    }
  }

  /** Grubbs critical z for sample size n at significance alpha
    * (one-sided max test, `grubbs.py:792-800`). */
  private[graft] def grubbsCritical(n: Int, alpha: Double): Double = {
    if (n < 3) return Double.PositiveInfinity
    val t = tIsf(alpha / n, n - 2.0)
    (n - 1.0) / math.sqrt(n.toDouble) *
      math.sqrt(t * t / (n - 2.0 + t * t))
  }

  /** Kept [min,max] range after the recursive one-sided-max Grubbs sweep. */
  private[graft] def grubbsRange(values: Array[Double], alpha: Double): (Double, Double) = {
    var kept = values.sorted
    var done = false
    while (!done && kept.length >= 15) { // min window per FilterShow.py:450
      val n = kept.length
      val mean = kept.sum / n
      val sd = math.sqrt(kept.map(v => (v - mean) * (v - mean)).sum / (n - 1))
      if (sd == 0) done = true
      else {
        // one-sided max: the sample farthest above/below the mean
        val zLow = (mean - kept.head) / sd
        val zHigh = (kept.last - mean) / sd
        val crit = grubbsCritical(n, alpha)
        if (zHigh >= zLow && zHigh > crit) kept = kept.dropRight(1)
        else if (zLow > zHigh && zLow > crit) kept = kept.drop(1)
        else done = true
      }
    }
    if (kept.isEmpty) (Double.NaN, Double.NaN) else (kept.head, kept.last)
  }

  /** Typed aggregator buffering a window's sample and emitting the kept
    * (min,max) range. Windows are bounded (sensor cadence × window span). */
  class GrubbsRange(alpha: Double = 0.05)
      extends Aggregator[Double, scala.collection.mutable.ArrayBuffer[Double], Array[Double]] {
    import scala.collection.mutable.ArrayBuffer
    def zero: ArrayBuffer[Double] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Double], v: Double): ArrayBuffer[Double] = { b += v; b }
    def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double]): ArrayBuffer[Double] = { a ++= b; a }
    def finish(b: ArrayBuffer[Double]): Array[Double] = {
      val (lo, hi) = grubbsRange(b.toArray, alpha)
      Array(lo, hi)
    }
    def bufferEncoder: Encoder[ArrayBuffer[Double]] =
      org.apache.spark.sql.Encoders.kryo[scala.collection.mutable.ArrayBuffer[Double]]
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Grubbs kept-range per key over half-overlapping sliding windows
    * (`grubbs.py:889-918` FindOutliers), returning one row per
    * (key, window) with the kept [lo,hi].
    */
  def grubbsSweep(df: DataFrame, key: Column, ts: Column, v: Column,
                  windowSec: Long, alpha: Double = 0.05): DataFrame = {
    val agg = udaf(new GrubbsRange(alpha))
    df.groupBy(key, window(ts, s"$windowSec seconds", s"${windowSec / 2} seconds"))
      .agg(agg(v).as("range"))
      .select(key, unix_timestamp(col("window.start")).as("win_start"),
        col("range")(0).as("keep_lo"), col("range")(1).as("keep_hi"))
  }
}
