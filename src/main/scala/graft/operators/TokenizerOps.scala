package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Tokenizer-training support: the corpus-wide merge-selection aggregate
  * of BPE training — count every adjacent token pair across the corpus
  * (WITH multiplicity) and take the top-K candidates. BPE proper runs
  * this over character/byte symbols and re-runs it after each merge;
  * the aggregate — a corpus-sized pair count feeding an ordered top-K —
  * is identical at every iteration and at every symbol granularity, so
  * it is computed here once over word tokens (the corpus' tokens
  * contract, [[TextFunctions.tokens]]); swapping the tokenizer to
  * byte/char symbols changes only the scan expression, not the plan.
  *
  * Scale shape: the pair fan-out comes from the native one-pass
  * `ngram_list` scan (the multiplicity sibling of `ngram_shingles` —
  * no regexp pass, no interpreted HOF), the count is ONE hash aggregate
  * keyed by pair (combines map-side: per-partition pair counts travel,
  * not pair occurrences), and the top-K is `TakeOrderedAndProject` —
  * per-partition heaps of K rows to the driver, never a global sort.
  * One shuffle total, sized by the distinct-pair vocabulary, not the
  * corpus.
  */
object TokenizerOps {

  /** Top-`k` adjacent token pairs by corpus frequency: (pair, n), ties
    * broken by pair text ascending — a total order, so the cut at K is
    * deterministic in both engines. */
  def topMergePairs(df: DataFrame, text: Column, k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(explode(call_function("ngram_list", text, lit(2))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  /** DuckDB twin of [[topMergePairs]] — same tokens contract, same
    * multiplicity, same (n DESC, pair ASC) cut. */
  def topMergePairsSql(textE: String, k: Int): String = {
    val tk = TextFunctions.tokensSql(textE)
    s"""WITH t AS (SELECT $tk AS tk FROM documents),
        g AS (SELECT unnest(CASE WHEN len(tk) >= 2
                THEN list_transform(range(len(tk) - 1),
                       i -> tk[i+1] || ' ' || tk[i+2])
                ELSE [] END) AS pair FROM t)
        SELECT pair, count(*) AS n FROM g GROUP BY 1
        ORDER BY n DESC, pair ASC LIMIT $k"""
  }
}
