package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Air-quality index scalar library (US EPA AQI, NL RIVM LKI, EU CAQI,
  * Canadian AQHI) as pure `Column` expressions (when-chains + arithmetic,
  * fully codegen'd — no UDFs).
  *
  * The computations mirror the reference (`scripts/AirQualityIndex.py`)
  * *exactly*, including its idiosyncrasies:
  *  - segment pick is `val < break[i+1]` (strict upper bound), AQI `:305-307`;
  *  - the interpolation denominator is `hi - hi/1000 - lo` (the reference
  *    subtracts `pollutant[indx+1]/1000`), AQI `:311-313`, LKI `:462-464`,
  *    CAQI `:736-738`;
  *  - AQI's index-side numerator is `(AQIs[indx+1] - 1) - AQIs[indx]`
  *    (`:311`), CAQI's is `CAQIclass[indx+1]·0.999 - CAQIclass[indx]`
  *    (`:736`), LKI's is plain `LKIs[indx+1] - LKIs[indx]` (`:462`);
  *  - values beyond the second-to-last break reuse the last regular
  *    segment's line (the reference clamps `indx`, AQI `:308-309`,
  *    LKI `:460`), then cap (AQI 500 `:315`, LKI 11 `:466`, CAQI 120
  *    `:740`);
  *  - AQI and LKI pre-round the input concentration per pollutant: O₃ 3
  *    decimals, PM2.5/CO 1 decimal, PM10/SO₂/NO₂ integer (AQI `:301-304`,
  *    LKI `:453-457`); CAQI interpolates the raw value (no input rounding
  *    anywhere in `CAQI()` `:649-685`);
  *  - AQI/CAQI round the result to an integer (`:314`, `:739`); LKI keeps
  *    the raw value (1-decimal presentation happens at view time).
  *
  * Divergence (documented): the reference raises for negative input (its
  * callers regex-reject non-numeric strings, `maxAQI :355`) and for values
  * beyond the final table break (IndexError in the segment loop); we return
  * 0 for negatives and cap instead of crashing — total functions are the
  * only sane column semantics.
  *
  * Each index also has a `sqlCase` renderer emitting the *same* computation
  * as ANSI SQL, so DuckDB oracles share one definition with the Spark plan.
  */
object AirQuality {

  /** One interpolation segment: for c in [lo, hi): iLo + slope·(c − lo).
    * The last segment also serves values ≥ its hi (reference index clamp).
    */
  final case class Segment(lo: Double, hi: Double, iLo: Double, slope: Double)

  /** A reference-faithful piecewise index mapping.
    *
    * @param inDecimals  pre-rounding of the concentration (per pollutant)
    * @param outInteger  whether the result is rounded to an integer
    * @param cap         upper cap applied after rounding
    */
  final case class PiecewiseTable(segments: Seq[Segment], inDecimals: Option[Int],
                                  outInteger: Boolean, cap: Double) {

    /** Spark expression: interpolated index of concentration column `c0`. */
    def column(c0: Column): Column = {
      val c = inDecimals.map(d => round(c0, d)).getOrElse(c0)
      val lastS = segments.last
      val chain = segments.init.foldRight(
          lit(lastS.iLo) + lit(lastS.slope) * (c - lastS.lo)) {
        case (s, els) =>
          when(c < s.hi, lit(s.iLo) + lit(s.slope) * (c - s.lo)).otherwise(els)
      }
      val r = if (outInteger) round(chain, 0) else chain
      when(c0.isNull, null).when(c < 0, 0).otherwise(least(r, lit(cap)))
    }

    /** Identical computation rendered as SQL (DuckDB/ANSI) for the oracle. */
    def sqlCase(v: String): String = {
      val c = inDecimals.map(d => s"round($v, $d)").getOrElse(s"($v)")
      def seg(s: Segment) = s"${s.iLo} + ${s.slope} * ($c - ${s.lo})"
      val chain = segments.init.foldRight(seg(segments.last)) { case (s, els) =>
        s"CASE WHEN $c < ${s.hi} THEN ${seg(s)} ELSE $els END"
      }
      val r = if (outInteger) s"round($chain, 0)" else s"($chain)"
      s"CASE WHEN $v IS NULL THEN NULL WHEN $c < 0 THEN 0 ELSE least($r, $cap) END"
    }

    /** Closed-form inverse: the concentration whose interpolated index is
      * `i0`, rounded half-up to 1 decimal (the forward functions' finest
      * input resolution). The reference inverts numerically — `GET_PM25`
      * (`scripts/forecast.pl:232-244`) walks the forward AQI routine in
      * halving steps until it brackets the target — because its forward
      * function is an opaque subroutine; each segment line is linear, so
      * the inverse is the same piecewise table solved for c:
      * `c = lo + (i − iLo)/slope`, segment picked by `i < next.iLo`.
      * Values past the last segment's start extrapolate its line (the
      * mirror of the forward clamp). Divergence (documented): closed form
      * instead of bisection — exact where the reference is ±step/2ⁿ.
      */
    def inverseColumn(i0: Column): Column = {
      def seg(s: Segment) = lit(s.lo) + (i0 - lit(s.iLo)) / lit(s.slope)
      val chain = segments.init.zip(segments.tail).foldRight(seg(segments.last)) {
        case ((s, nxt), els) => when(i0 < nxt.iLo, seg(s)).otherwise(els)
      }
      when(i0.isNull, null).when(i0 <= 0, null)
        .otherwise(floor(chain * 10 + 0.5) / 10.0)
    }

    /** SQL twin of [[inverseColumn]] for the DuckDB oracle. */
    def inverseSql(v: String): String = {
      def seg(s: Segment) = s"(${s.lo} + (($v) - ${s.iLo}) / ${s.slope})"
      val chain = segments.init.zip(segments.tail).foldRight(seg(segments.last)) {
        case ((s, nxt), els) =>
          s"CASE WHEN ($v) < ${nxt.iLo} THEN ${seg(s)} ELSE $els END"
      }
      s"CASE WHEN $v IS NULL THEN NULL WHEN ($v) <= 0 THEN NULL ELSE floor(($chain) * 10 + 0.5) / 10.0 END"
    }
  }

  /** US EPA AQI family (`AirQualityIndex.py:233-241` AQItable, `:243` AQIs,
    * formula `:305-315`): breaks B (8 entries) with index lows
    * I = [0,51,101,151,201,301,401]; segment i line is
    * `I[i] + (I[i+1]−1−I[i])/(B[i+1]·0.999 − B[i])·(c − B[i])`; segments
    * 0..5 usable (indx clamp `:308`), integer result, cap 500.
    */
  private def aqiTable(breaks: Seq[Double], inDecimals: Int): PiecewiseTable = {
    val idx = Seq(0.0, 51, 101, 151, 201, 301, 401)
    val segs = (0 to 5).map { i =>
      Segment(breaks(i), breaks(i + 1), idx(i),
        (idx(i + 1) - 1 - idx(i)) / (breaks(i + 1) * 0.999 - breaks(i)))
    }
    PiecewiseTable(segs, Some(inDecimals), outInteger = true, cap = 500)
  }

  /** AQI for PM2.5 µg/m³ (1-decimal input rounding, `:303`). */
  val aqiPm25: PiecewiseTable =
    aqiTable(Seq(0, 12.1, 35.5, 55.5, 150.5, 250.5, 350.5, 500.4), 1)

  /** AQI for PM10 µg/m³ (integer input rounding, `:304`). */
  val aqiPm10: PiecewiseTable =
    aqiTable(Seq(0, 55, 155, 255, 355, 425, 505, 604), 0)

  /** NL RIVM LKI family (`AirQualityIndex.py:414-423` LKItable, `:425`
    * LKIs = 0..12, formula `:458-466`): each LKItable row carries 11 breaks
    * — 10 real boundaries plus a trailing 1000 sentinel — so the clamp
    * `indx >= len-2 → indx -= 1` (`:460`) only fires at indx ≥ 9, leaving
    * segments 0..8 usable. Segment i maps breaks (B[i], B[i+1]) to indices
    * (i, i+1) with slope `1/(B[i+1]·0.999 − B[i])`; values ≥ B[9]
    * extrapolate segment 8's line (pm2.5 95 → 8 + 5/(100·0.999−90) =
    * 8.5051; 120 → 11.03, capped). Raw result, cap 11. The sentinel itself
    * never enters the arithmetic, so the 10 real breaks suffice here.
    */
  private def lkiTable(breaks: Seq[Double], inDecimals: Int): PiecewiseTable = {
    val segs = (0 to 8).map { i =>
      Segment(breaks(i), breaks(i + 1), i.toDouble,
        1.0 / (breaks(i + 1) * 0.999 - breaks(i)))
    }
    PiecewiseTable(segs, Some(inDecimals), outInteger = false, cap = 11)
  }

  /** LKI for PM2.5 (`:417` pm_25 row; 1-decimal input rounding `:456`). */
  val lkiPm25: PiecewiseTable =
    lkiTable(Seq(0, 10, 15, 20, 30, 40, 50, 70, 90, 100), 1)

  /** LKI for PM10 (`:416` pm_10 row; integer input rounding `:457`). */
  val lkiPm10: PiecewiseTable =
    lkiTable(Seq(0, 10, 20, 30, 45, 60, 75, 100, 125, 150), 0)

  /** EU CAQI family (`AirQualityIndex.py:590-640` CAQItable background,
    * `:642` CAQIclass = [0,25,50,75,100,125], formula `:734-740`):
    * segment i line is `C[i] + (C[i+1]·0.999 − C[i])/(B[i+1]·0.999 − B[i])
    * ·(c − B[i])`; all five segments incl. (180,360)→(100,125); integer
    * result, cap 120 (`:740` — the reference caps at 120, not 125).
    */
  private def caqiTable(breaks: Seq[Double]): PiecewiseTable = {
    val cls = Seq(0.0, 25, 50, 75, 100, 125)
    val segs = (0 to 4).map { i =>
      Segment(breaks(i), breaks(i + 1), cls(i),
        (cls(i + 1) * 0.999 - cls(i)) / (breaks(i + 1) * 0.999 - breaks(i)))
    }
    // CAQI takes the RAW concentration — the reference's CAQI() has no
    // input rounding (only AQI :301-304 and LKI :453-457 pre-round).
    PiecewiseTable(segs, None, outInteger = true, cap = 120)
  }

  /** CAQI (background, hourly) for PM10 (`:612` level [0,25,50,90,180,360]). */
  val caqiPm10: PiecewiseTable = caqiTable(Seq(0, 25, 50, 90, 180, 360))

  /** CAQI (background, hourly) for PM2.5 (`:622` level [0,15,30,55,110,220]). */
  val caqiPm25: PiecewiseTable = caqiTable(Seq(0, 15, 30, 55, 110, 220))

  /** Canadian AQHI: `(1000/10.4)·Σ(exp(βᵢ·polᵢ)−1)`, β = 0.000537 (O₃),
    * 0.000871 (NO₂), 0.000487 (PM2.5); capped at 11, 2 decimals
    * (reference `AirQualityIndex.py:861-872`).
    */
  def aqhi(o3: Column, no2: Column, pm25: Column): Column =
    round(least(
      lit(1000.0 / 10.4) * ((exp(lit(0.000537) * o3) - 1) +
        (exp(lit(0.000871) * no2) - 1) + (exp(lit(0.000487) * pm25) - 1)),
      lit(11.0)), 2)

  /** SQL twin of [[aqhi]] for the DuckDB oracle. */
  def aqhiSql(o3: String, no2: String, pm25: String): String =
    s"round(least((1000.0/10.4) * ((exp(0.000537*$o3)-1) + (exp(0.000871*$no2)-1) + (exp(0.000487*$pm25)-1)), 11.0), 2)"

  /** Combined AQI: max over per-pollutant indices plus the reference's
    * "cumulative effect" bump — when more than one pollutant is DEFINED
    * and the indices sit within 25 of each other (`min_val + 25 >=
    * max_val`), add 25 (`AirQualityIndex.py:369-370` maxAQI; no post-bump
    * cap). "Defined" follows `:358` — `if new < 0.01: continue` — so
    * sub-0.01 indices count toward neither `cnt` nor the min/max set;
    * undefined indices fall back to the reference's loop-initial values —
    * `max_val = 0` (`:327`) and `min_val = 999` — which double as
    * NULL-free sentinels, keeping greatest/least portable between Spark
    * (null-skipping) and DuckDB (defined indices lie in [0.01, 500], so
    * the sentinels can never win a defined comparison).
    */
  def maxIndex(indices: Column*): Column = {
    val mx = greatest(indices.map(i => when(i >= 0.01, i).otherwise(0.0)): _*)
    val mn = least(indices.map(i => when(i >= 0.01, i).otherwise(999.0)): _*)
    val cnt = indices.map(i => when(i >= 0.01, 1).otherwise(0)).reduce(_ + _)
    when(cnt > 1 && mn + 25.0 >= mx, mx + 25.0).otherwise(mx)
  }

  /** SQL twin of [[maxIndex]] for the DuckDB oracle. Callers should bind
    * the index expressions to aliases/CTE columns first — each expression
    * is referenced four times here. */
  def maxIndexSql(indices: Seq[String]): String = {
    val mx = indices.map(i => s"CASE WHEN $i >= 0.01 THEN $i ELSE 0.0 END")
      .mkString("greatest(", ", ", ")")
    val mn = indices.map(i => s"CASE WHEN $i >= 0.01 THEN $i ELSE 999.0 END")
      .mkString("least(", ", ", ")")
    val cnt = indices.map(i => s"(CASE WHEN $i >= 0.01 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""CASE WHEN ($cnt) > 1 AND $mn + 25.0 >= $mx THEN $mx + 25.0
          ELSE $mx END"""
  }

  /** Combined CAQI: same shape, +50 bump, no >1-pollutant requirement
    * (`AirQualityIndex.py:754-755` maxCAQI), with the same < 0.01
    * exclusion (`:735`) and loop-initial sentinels (max 0 `:695`,
    * min 999). Not modeled: the mandated-pollutant zeroing (`:747-750`) —
    * a deployment-config concern (which pollutants a station must offer),
    * not a per-row computation. */
  def maxCaqi(indices: Column*): Column = {
    val mx = greatest(indices.map(i => when(i >= 0.01, i).otherwise(0.0)): _*)
    val mn = least(indices.map(i => when(i >= 0.01, i).otherwise(999.0)): _*)
    when(mn + 25.0 >= mx, mx + 50.0).otherwise(mx)
  }

  /** SQL twin of [[maxCaqi]] for the DuckDB oracle. */
  def maxCaqiSql(indices: Seq[String]): String = {
    val mx = indices.map(i => s"CASE WHEN $i >= 0.01 THEN $i ELSE 0.0 END")
      .mkString("greatest(", ", ", ")")
    val mn = indices.map(i => s"CASE WHEN $i >= 0.01 THEN $i ELSE 999.0 END")
      .mkString("least(", ", ", ")")
    s"CASE WHEN $mn + 25.0 >= $mx THEN $mx + 50.0 ELSE $mx END"
  }

  // ------------------------------------------------- index classification

  /** LKI colour scale (`AirQualityIndex.py:390-395` colors, `:396-401`
    * colors_index), rendered as `forecast.pl:429`'s `sprintf("#%0.6X")`
    * strings. Entry 0 (`#0F0F0F`) is the "unknown" colour for index values
    * below 0.05.
    */
  val lkiColors: Seq[String] = Seq(
    0x0f0f0f, 0x0020c5, 0x002bf7, 0x006df8, 0x009cf9, 0x2dcdfb,
    0xc4ecfd, 0xfffed0, 0xfffda4, 0xfffd7b, 0xfffc4d, 0xf4e645,
    0xffb255, 0xff9845, 0xfe7626, 0xff0a17, 0xdc0610, 0xa21794)
    .map(c => f"#$c%06X")

  /** Class boundaries paired with [[lkiColors]] (strict upper bound pick,
    * `AirQualityIndex.py:165-168` AQI_view). */
  val lkiColorIndex: Seq[Double] = Seq(
    0, 0.05, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.6, 4.2, 4.8,
    5.4, 6.0, 6.7, 7.4, 8.0, 9.0, 10)

  /** LKI quality qualifiers (`AirQualityIndex.py:402-405` quality; English
    * message keys — the reference translates to Dutch per LANGUAGE env). */
  val lkiQuality: Seq[String] =
    Seq("unknown", "good", "moderate", "unhealthy", "critical")

  /** Boundaries paired with [[lkiQuality]] (`:406-409` quality_index). */
  val lkiQualityIndex: Seq[Double] = Seq(0, 0.05, 3, 6, 8)

  /** Threshold classification: `labels(i)` where `v < thresholds(i+1)`,
    * last label for values past the final boundary (`AQI_view`'s loop,
    * `AirQualityIndex.py:163-169`; the reference would IndexError past the
    * last boundary — we clamp to the last class instead, the same
    * total-function stance as the index caps). Null in, null out.
    */
  def classify(v: Column, thresholds: Seq[Double], labels: Seq[String]): Column = {
    require(thresholds.length == labels.length, "thresholds/labels must pair")
    val chain = labels.init.zip(thresholds.tail).foldRight(lit(labels.last)) {
      case ((lbl, hi), els) => when(v < hi, lbl).otherwise(els)
    }
    when(v.isNull, null).otherwise(chain)
  }

  /** SQL twin of [[classify]] for the DuckDB oracle. */
  def classifySql(v: String, thresholds: Seq[Double], labels: Seq[String]): String = {
    require(thresholds.length == labels.length, "thresholds/labels must pair")
    val chain = labels.init.zip(thresholds.tail).foldRight(s"'${labels.last}'") {
      case ((lbl, hi), els) => s"CASE WHEN ($v) < $hi THEN '$lbl' ELSE $els END"
    }
    s"CASE WHEN $v IS NULL THEN NULL ELSE $chain END"
  }
}
