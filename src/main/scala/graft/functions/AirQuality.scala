package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Air-quality index scalar library (US EPA AQI, NL RIVM LKI, EU CAQI,
  * Canadian AQHI) as pure `Column` expressions (when-chains + arithmetic,
  * fully codegen'd — no UDFs).
  *
  * Breakpoint tables follow the reference (`scripts/AirQualityIndex.py`):
  * AQI `:233-241`, LKI `:414-423`, CAQI `:590-640`, AQHI `:861-868`.
  * Interpolation uses the published EPA formula
  * `I = (Ihi-Ilo)/(Chi-Clo)·(C-Clo) + Ilo` per segment, capped at the
  * table max.
  *
  * Each index also has a [[PiecewiseTable.sqlCase]] renderer that emits the
  * *same* computation as ANSI SQL, so DuckDB oracles share one definition
  * with the Spark plan (no dual-maintenance drift).
  */
object AirQuality {

  /** A piecewise-linear mapping: concentration segments -> index segments. */
  final case class PiecewiseTable(segments: Seq[(Double, Double, Double, Double)],
                                  cap: Double, decimals: Int) {
    // segments: (cLo, cHi, iLo, iHi)

    /** Spark expression: interpolated index of concentration column `c`. */
    def column(c0: Column): Column = {
      val c = round(c0, decimals)
      val chain = segments.foldRight(lit(cap)) { case ((cLo, cHi, iLo, iHi), els) =>
        when(c <= cHi, lit((iHi - iLo) / (cHi - cLo)) * (c - cLo) + iLo).otherwise(els)
      }
      when(c0.isNull, null).when(c < 0, 0).otherwise(least(chain, lit(cap)))
    }

    /** Identical computation rendered as SQL (DuckDB/ANSI) for the oracle. */
    def sqlCase(v: String): String = {
      val c = s"round($v, $decimals)"
      val chain = segments.foldRight(cap.toString) { case ((cLo, cHi, iLo, iHi), els) =>
        s"CASE WHEN $c <= $cHi THEN ${(iHi - iLo) / (cHi - cLo)} * ($c - $cLo) + $iLo ELSE $els END"
      }
      s"CASE WHEN $v IS NULL THEN NULL WHEN $c < 0 THEN 0 ELSE least($chain, $cap) END"
    }
  }

  /** US EPA AQI for PM2.5 (µg/m³, 1-decimal rounding per EPA; table per
    * reference `AirQualityIndex.py:236` / EPA AQI technical assistance doc).
    */
  val aqiPm25: PiecewiseTable = PiecewiseTable(Seq(
    (0.0, 12.0, 0, 50), (12.1, 35.4, 51, 100), (35.5, 55.4, 101, 150),
    (55.5, 150.4, 151, 200), (150.5, 250.4, 201, 300),
    (250.5, 350.4, 301, 400), (350.5, 500.4, 401, 500)).map {
      case (a, b, c, d) => (a, b, c.toDouble, d.toDouble) }, 500, 1)

  /** US EPA AQI for PM10 (µg/m³, integer rounding). */
  val aqiPm10: PiecewiseTable = PiecewiseTable(Seq(
    (0.0, 54.0, 0, 50), (55.0, 154.0, 51, 100), (155.0, 254.0, 101, 150),
    (255.0, 354.0, 151, 200), (355.0, 424.0, 201, 300),
    (425.0, 504.0, 301, 400), (505.0, 604.0, 401, 500)).map {
      case (a, b, c, d) => (a, b, c.toDouble, d.toDouble) }, 500, 0)

  /** NL RIVM LKI (report 2014-0050) for PM2.5, range 0-11, 1 decimal
    * (reference `AirQualityIndex.py:414-423`).
    */
  val lkiPm25: PiecewiseTable = PiecewiseTable({
    val breaks = Seq(0.0, 10, 15, 20, 30, 40, 50, 70, 90, 100)
    breaks.init.zip(breaks.tail).zipWithIndex.map { case ((lo, hi), i) =>
      (lo, hi, (i + 1).toDouble, (i + 2).toDouble)
    }
  }, 11, 1)

  /** NL RIVM LKI for PM10 (`AirQualityIndex.py:417`). */
  val lkiPm10: PiecewiseTable = PiecewiseTable({
    val breaks = Seq(0.0, 10, 20, 30, 45, 60, 75, 100, 125, 150)
    breaks.init.zip(breaks.tail).zipWithIndex.map { case ((lo, hi), i) =>
      (lo, hi, (i + 1).toDouble, (i + 2).toDouble)
    }
  }, 11, 1)

  /** EU CAQI (background) for PM10 hourly, classes 0-25-50-75-100, cap 125
    * (`AirQualityIndex.py:612-616`, class bounds `:644`).
    */
  val caqiPm10: PiecewiseTable = PiecewiseTable({
    val breaks = Seq(0.0, 25, 50, 90, 180)
    breaks.init.zip(breaks.tail).zipWithIndex.map { case ((lo, hi), i) =>
      (lo, hi, i * 25.0, (i + 1) * 25.0)
    }
  }, 125, 0)

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

  /** Combined index: max over per-pollutant indices, with the reference's
    * "cumulative effect" bump when all pollutants sit in the same band
    * (`AirQualityIndex.py:323-375` maxAQI: +25 when min≈max).
    */
  def maxIndex(indices: Column*): Column = {
    val mx = greatest(indices: _*)
    val mn = least(indices: _*)
    when(mx - mn <= 1.0, least(mx + 25.0, lit(500.0))).otherwise(mx)
  }
}
