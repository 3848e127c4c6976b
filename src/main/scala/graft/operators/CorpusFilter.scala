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

  /** Gate thresholds (documented in one place; the SQL twins inline the
    * same literals). */
  private val MinTok = 5
  private val MaxTok = 2000
  private val MeanLenLo = 2.5
  private val MeanLenHi = 12.0
  private val MinAlpha = 0.6
  private val MinStop = 0.08

  /** (rule name, pass predicate) in report order. */
  def rules(text: Column): Seq[(String, Column)] = {
    val tk = TextFunctions.tokens(text)
    val nTok = size(tk).cast("double")
    val meanLen = length(concat_ws("", tk)).cast("double") / nTok
    val alpha = length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") /
      length(text)
    Seq(
      "len" -> nTok.between(MinTok, MaxTok),
      "mean_token_len" -> meanLen.between(MeanLenLo, MeanLenHi),
      "alpha_ratio" -> (alpha >= MinAlpha),
      "stopwords" -> (TextFunctions.langScore(text, "en") >= MinStop))
  }

  /** SQL twins of [[rules]], same names and order. */
  def rulesSql(e: String): Seq[(String, String)] = {
    val tk = TextFunctions.tokensSql(e)
    val nTok = s"CAST(len($tk) AS DOUBLE)"
    val meanLen = s"(length(array_to_string($tk, '')) / $nTok)"
    val alpha =
      s"(length(regexp_replace($e, '[^A-Za-z ]', '', 'g')) / CAST(length($e) AS DOUBLE))"
    Seq(
      "len" -> s"($nTok BETWEEN $MinTok AND $MaxTok)",
      "mean_token_len" -> s"($meanLen BETWEEN $MeanLenLo AND $MeanLenHi)",
      "alpha_ratio" -> s"($alpha >= $MinAlpha)",
      "stopwords" -> s"(${TextFunctions.langScoreSql(e, "en")} >= $MinStop)")
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

  /** Deterministic per-stratum hash sampling. `fractions` maps stratum
    * values to keep-fractions (millionths resolution); missing strata
    * use `defaultFraction`. Kept ⟺
    * `pmod(hash32(stratum || ':' || id), 1e6) < frac·1e6` — no RNG, no
    * shuffle, reproducible anywhere the hash is. */
  def sampleStratified(df: DataFrame, id: Column, stratum: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double): DataFrame = {
    val frac = fractions.foldRight(lit(defaultFraction)) {
      case ((s, f), els) => when(stratum === s, lit(f)).otherwise(els)
    }
    val bucket = pmod(
      TextFunctions.hash32(concat(stratum, lit(":"), id.cast("string"))),
      lit(1000000L))
    // explicit floor: Spark's double→long cast truncates but DuckDB's
    // CAST rounds — floor() on both sides keeps the threshold identical
    df.where(bucket < floor(frac * 1000000L))
  }

  /** SQL twin of [[sampleStratified]]'s predicate. */
  def sampleStratifiedSql(idE: String, stratumE: String,
                          fractions: Map[String, Double],
                          defaultFraction: Double): String = {
    val frac = fractions.foldRight(defaultFraction.toString) {
      case ((s, f), els) => s"CASE WHEN $stratumE = '$s' THEN $f ELSE $els END"
    }
    val h = TextFunctions.hash32Sql(s"($stratumE || ':' || CAST($idE AS VARCHAR))")
    // hash32 is in [0, 2^32) — plain % equals pmod for non-negative input;
    // floor (not CAST) — DuckDB's double→BIGINT cast ROUNDS
    s"(($h % 1000000) < floor(($frac) * 1000000))"
  }
}
