package graft.functions

/** Numeric stats primitives needed by the Grubbs outlier test: regularized
  * incomplete beta (continued fraction, Lentz's method — the standard
  * public-domain formulation) and the Student-t inverse survival function
  * via bisection on the exact CDF relation
  * `P(T > t) = I_{df/(df+t²)}(df/2, 1/2) / 2` for t ≥ 0.
  */
object Stats {

  private def lnGamma(x: Double): Double = {
    // Lanczos approximation (g=7, n=9), public constants.
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz). Valid
    * in the fast-convergence region x < (a+1)/(a+b+2). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val eps = 1e-15
    val fpmin = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1)
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((a + m2 - 1) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). The symmetric branch calls
    * the continued fraction directly (no mutual recursion — at the
    * boundary x = (a+1)/(a+b+2) both orientations would otherwise swap
    * forever). */
  def betainc(a: Double, b: Double, x: Double): Double = {
    require(x >= 0 && x <= 1, s"x out of [0,1]: $x")
    if (x == 0.0 || x == 1.0) return x
    val lbeta = lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      a * math.log(x) + b * math.log(1 - x)
    val front = math.exp(lbeta)
    if (x < (a + 1) / (a + b + 2)) front * betacf(a, b, x) / a
    else 1.0 - front * betacf(b, a, 1.0 - x) / b
  }

  /** Student-t survival function P(T > t), df ≥ 1. */
  def tSf(t: Double, df: Double): Double =
    if (t >= 0) 0.5 * betainc(df / 2.0, 0.5, df / (df + t * t))
    else 1.0 - tSf(-t, df)

  /** Student-t inverse survival function: t with P(T > t) = q, q ∈ (0, 0.5].
    * Bisection — monotone, robust; ~60 iterations to 1e-12. */
  def tIsf(q: Double, df: Double): Double = {
    require(q > 0 && q <= 0.5, s"q out of (0, 0.5]: $q")
    var lo = 0.0
    var hi = 1.0
    while (tSf(hi, df) > q) hi *= 2 // bracket
    var i = 0
    while (i < 200 && hi - lo > 1e-12 * math.max(1.0, hi)) {
      val mid = 0.5 * (lo + hi)
      if (tSf(mid, df) > q) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** Grubbs critical G for one pass: `(N−1)/√N · √(t²/(N−2+t²))` with
    * `t = tIsf(α/N, N−2)` (reference: statistics/grubbs.py:760-827, the
    * one-sided max test with α=0.05 default at :229-232). */
  def grubbsCritical(n: Int, alpha: Double): Double = {
    val t = tIsf(alpha / n, n - 2.0)
    (n - 1.0) / math.sqrt(n.toDouble) * math.sqrt(t * t / (n - 2.0 + t * t))
  }
}
