package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation/benchmark set — the standard
  * pretraining-hygiene step (e.g. GPT-3 §C / PaLM-style 13-gram overlap,
  * scaled here to the corpus' short synthetic docs).
  *
  * Shape at 100 TB: both sides are shingled by the native one-pass
  * `ngram_shingles` scan, grams are reduced to a 60-bit portable hash
  * (one BIGINT shuffle key instead of a string), the benchmark side is
  * deduplicated BEFORE the join (its distinct-gram set is the small
  * side — a benchmark corpus is orders of magnitude smaller than the
  * training corpus), and the hit count per training doc is a single
  * hash aggregate keyed by doc id. Two shuffles total, both keyed and
  * capped by data actually matching; AQE broadcasts the benchmark side
  * whenever it fits. No all-pairs anywhere.
  */
object Decontaminate {

  /** (doc_id, n_overlap) for every NON-benchmark document sharing at
    * least one distinct word `n`-gram with the benchmark partition
    * (`isBenchmark` selects the held-out rows). `n_overlap` counts the
    * training doc's distinct grams that occur anywhere in the benchmark
    * set, where gram identity is its 60-bit md5 prefix
    * ([[TextFunctions.hash60]]) — the same contract the DuckDB oracle
    * states, so engine/oracle equivalence is by construction. */
  def overlap(df: DataFrame, id: Column, text: Column,
              isBenchmark: Column, n: Int): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val grams = df.select(
        id.as("doc_id"), isBenchmark.as("is_bench"),
        explode(call_function("ngram_shingles", text, lit(n))).as("g"))
      .select(col("doc_id"), col("is_bench"),
        TextFunctions.hash60(col("g")).as("hg"))
    // distinct BEFORE the join: the benchmark gram set is the unit the
    // join fans out on, so its dedup must happen on the build side, not
    // after the fact (post-join distinct would carry the full fan-out).
    val bench = grams.where(col("is_bench")).select(col("hg")).distinct()
    grams.where(!col("is_bench"))
      .join(bench, "hg") // per-doc grams are distinct ⇒ one row per hit
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** DuckDB twin of [[overlap]] — same shingling, same 60-bit gram
    * hash, same benchmark-side dedup. */
  def overlapSql(idE: String, textE: String, benchPred: String,
                 n: Int): String = {
    val sh = TextFunctions.shinglesSql(textE, n)
    val hg = TextFunctions.hash60Sql("g")
    s"""WITH grams AS (SELECT $idE AS doc_id, ($benchPred) AS is_bench,
                              $hg AS hg
                       FROM (SELECT *, unnest($sh) AS g FROM documents)),
        bench AS (SELECT DISTINCT hg FROM grams WHERE is_bench)
        SELECT doc_id, count(*) AS n_overlap
        FROM grams JOIN bench USING (hg)
        WHERE NOT is_bench GROUP BY doc_id"""
  }
}
