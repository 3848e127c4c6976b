package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Training-corpus admission control: rule-attributed quality filtering
  * and deterministic stratified sampling — the two steps between "scored"
  * (q31-q33) and "training set".
  *
  * Quality RULES (the C4/Gopher-style recipe, same signals as
  * [[TextFunctions.qualityScore]] but as hard gates): a production
  * pipeline must report WHICH rule dropped a document (rule attribution
  * drives threshold tuning and corpus audits), not just a composite
  * score. Every rule is a pure Column predicate over integer-derived
  * doubles — both engines compute bit-identical values, so the
  * pass/fail booleans are oracle-exact without rounding guards.
  *
  * Stratified SAMPLING: `pmod(hash32(stratum:id), 1e6) < frac·1e6` —
  * decision is a pure function of (stratum, id), so the sample is
  * exactly reproducible across runs/clusters/engines, needs no shuffle,
  * no state, and composes with any upstream filter. This (not `rand()`)
  * is how a 100 TB pipeline samples: re-runs and backfills pick the
  * SAME documents.
  */
object CorpusFilter {

  /** Gate-only thresholds; the length/mean-length bounds are
    * [[TextFunctions]]' shared quality constants — the SAME values the
    * soft qualityScore weighs, as hard gates. */
  private val MinAlpha = 0.6
  private val MinStop = 0.08

  /** (rule name, pass predicate) in report order. Signal expressions are
    * TextFunctions' shared definitions (meanTokenLen/alphaRatio) — one
    * rendering for score and gate, both engines. */
  def rules(text: Column): Seq[(String, Column)] = {
    import TextFunctions._
    val tk = tokens(text)
    Seq(
      "len" -> size(tk).cast("double").between(QualityMinTok, QualityMaxTok),
      "mean_token_len" ->
        meanTokenLen(tk).between(QualityMeanLenLo, QualityMeanLenHi),
      "alpha_ratio" -> (alphaRatio(text) >= MinAlpha),
      "stopwords" -> (langScore(text, "en") >= MinStop))
  }

  /** SQL twins of [[rules]], same names and order. */
  def rulesSql(e: String): Seq[(String, String)] = {
    import TextFunctions._
    val tk = tokensSql(e)
    Seq(
      "len" ->
        s"(CAST(len($tk) AS DOUBLE) BETWEEN $QualityMinTok AND $QualityMaxTok)",
      "mean_token_len" ->
        s"(${meanTokenLenSql(tk)} BETWEEN $QualityMeanLenLo AND $QualityMeanLenHi)",
      "alpha_ratio" -> s"(${alphaRatioSql(e)} >= $MinAlpha)",
      "stopwords" -> s"(${langScoreSql(e, "en")} >= $MinStop)")
  }

  /** Per-document verdicts: one boolean column per rule, the combined
    * `keep`, and `fail_reasons` (comma-joined names of failed rules —
    * empty string for kept docs), the audit column a filtering report
    * aggregates. */
  def withAttribution(df: DataFrame, id: Column, text: Column): DataFrame = {
    val rs = rules(text)
    df.select(id.as("doc_id") +: rs.map { case (n, p) => p.as(s"r_$n") }: _*)
      .withColumn("keep", rs.map(r => col(s"r_${r._1}")).reduce(_ && _))
      .withColumn("fail_reasons", concat_ws(",",
        rs.map { case (n, _) => when(!col(s"r_$n"), lit(n)) }: _*))
  }

  /** The integer keep-threshold in millionths, computed ONCE in Scala
    * and inlined as a literal into both the Column predicate and the SQL
    * twin. Computing `floor(frac·1e6)` inside each engine is NOT
    * engine-stable: Spark floors the binary double while DuckDB parses
    * the rendered fraction as an exact DECIMAL and multiplies exactly —
    * ~1.2% of millionth-resolution fractions land one bucket apart
    * (e.g. 0.001001). One driver-side floor, two identical literals. */
  private def thresholdMillionths(f: Double): Long = {
    require(f >= 0 && f <= 1, s"fraction out of [0,1]: $f")
    math.floor(f * 1000000L).toLong
  }

  /** Deterministic per-stratum hash sampling. `fractions` maps stratum
    * values to keep-fractions (millionths resolution); missing strata
    * use `defaultFraction`. Kept ⟺
    * `pmod(hash32(stratum || ':' || id), 1e6) < floor(frac·1e6)` — no
    * RNG, no shuffle, reproducible anywhere the hash is. */
  def sampleStratified(df: DataFrame, id: Column, stratum: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double): DataFrame = {
    val thr = fractions.foldRight(lit(thresholdMillionths(defaultFraction))) {
      case ((s, f), els) =>
        when(stratum === s, lit(thresholdMillionths(f))).otherwise(els)
    }
    val bucket = pmod(
      TextFunctions.hash32(concat(stratum, lit(":"), id.cast("string"))),
      lit(1000000L))
    df.where(bucket < thr)
  }

  /** SQL twin of [[sampleStratified]]'s predicate — same pre-floored
    * integer thresholds. */
  def sampleStratifiedSql(idE: String, stratumE: String,
                          fractions: Map[String, Double],
                          defaultFraction: Double): String = {
    val thr = fractions.foldRight(thresholdMillionths(defaultFraction).toString) {
      case ((s, f), els) =>
        s"CASE WHEN $stratumE = '$s' THEN ${thresholdMillionths(f)} ELSE $els END"
    }
    val h = TextFunctions.hash32Sql(s"($stratumE || ':' || CAST($idE AS VARCHAR))")
    // hash32 is in [0, 2^32) — plain % equals pmod for non-negative input
    s"(($h % 1000000) < ($thr))"
  }
}
