package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions

/** Specs for the r10 additions q108/q109: BPE merge-pair selection
  * (incl. the `ngram_list` multiplicity native it rides) and
  * embedding-space decontamination. */
class TokenizerDeconSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ngram_list keeps every occurrence in order (vs declarative chain)") {
    val texts = Seq("", "   ", "one", "a b a b a b", "x  Y x y X y tail",
      "repeat repeat repeat", "unicode café straße café straße")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- 1 to 3) {
      val declarative = { // shinglesOfTokens minus the array_distinct
        val tk = col("tk")
        when(size(tk) >= n,
          transform(sequence(lit(0), size(tk) - n),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(tk, (i + j + 1).cast("int"))): _*)))
          .otherwise(array().cast("array<string>"))
      }
      val got = df.select(col("id"),
        call_function("ngram_list", col("text"), lit(n)).as("g"))
      val want = df.select(col("id"), TextFunctions.tokens(col("text")).as("tk"))
        .select(col("id"), declarative.as("g"))
      val diff = got.as("a").join(want.as("b"), Seq("id"))
        .where(not(col("a.g") <=> col("b.g")))
      assert(diff.count() === 0, s"n=$n")
    }
  }

  test("topMergePairs: multiplicity counts, deterministic tie-break, cut at k") {
    val docs = Seq(
      (1L, "a b a b a b"),   // "a b" ×3, "b a" ×2
      (2L, "a b c"),         // "a b", "b c"
      (3L, "b c"),           // "b c"
      (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TokenizerOps.topMergePairs(docs, col("text"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // counts: "a b"→4, "b a"→2, "b c"→2 — tie at rank 2 broken by text asc
    assert(out.toSeq === Seq(("a b", 4L), ("b a", 2L)))
  }

  test("embedOverlap: exact hits vs the benchmark side only") {
    val docs = Seq(
      (1L, Array(1f, 0f), false),  // cos 1.0 with bench 10 → hit
      (2L, Array(0.8f, 0.6f), false), // cos 0.8 with b10, 0.6 with b11 → 2 hits at t=0.5
      (3L, Array(0f, -1f), false), // cos ≤ 0 with both → no hit
      (10L, Array(2f, 0f), true),
      (11L, Array(0f, 3f), true))
      .toDF("vec_id", "embedding", "bench")
    val out = Decontaminate.embedOverlap(docs, col("vec_id"),
        col("embedding"), col("bench"), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((1L, 1.0)))
    assert(out(2L) === ((2L, 0.8)))
  }
}
