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

  test("embedOverlap: broadcast gate routes to the LSH path and back") {
    // Filler training vectors (ids 100+) so the training side covers the
    // p·bands SRP planes — r13's rank-based plane selection fails LOUDLY
    // on shortfall (ADVICE r12) instead of silently degrading recall,
    // so a forced-LSH fixture must satisfy the plane contract. Fillers
    // only add hits; every assertion below is relational (LSH ⊆ exact)
    // or about the identical-direction pair, so they are draw-safe.
    val fillers = (0 until 60).map { i =>
      (100L + i, Array(math.cos(0.1 * i).toFloat,
        math.sin(0.1 * i).toFloat), false)
    }
    val docs = (Seq(
      (1L, Array(1f, 0f), false),
      (2L, Array(0.8f, 0.6f), false),
      (3L, Array(0f, -1f), false),
      (10L, Array(2f, 0f), true),
      (11L, Array(0f, 3f), true)) ++ fillers)
      .toDF("vec_id", "embedding", "bench")
    def run(maxBench: Long) =
      Decontaminate.embedOverlap(docs, col("vec_id"), col("embedding"),
        col("bench"), threshold = 0.5, maxBenchBroadcast = maxBench)
    val exact = run(100L) // nBench = 2 ≤ 100 → broadcast-exact path
    val lsh = run(1L)     // nBench = 2 > 1 → SRP-banded cross path
    // the LSH path (and only it) carries the hot-bucket LeftAnti drop
    assert(!exact.queryExecution.executedPlan.toString.contains("LeftAnti"))
    assert(lsh.queryExecution.executedPlan.toString.contains("LeftAnti"))
    val toMap = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val (e, l) = (toMap(exact), toMap(lsh))
    // hits are exact-verified on both paths, so the LSH result is a
    // PER-VECTOR SUBSET of the exact audit: no vector outside the exact
    // hit set, no hit count above it, and any reported max_cos is a cos
    // the exact path also saw (≤ its max). (r12: planes now come from
    // the training side only — ADVICE r11 — so this tiny fixture no
    // longer happens to bucket every cross pair together; recall floors
    // for the real knobs are probed at scale in docs/SCALING.md.)
    assert(l.keySet.subsetOf(e.keySet), "LSH hit a vector exact did not")
    l.foreach { case (id, (nHits, maxCos)) =>
      assert(nHits <= e(id)._1, s"vec $id: LSH n_hits above exact")
      assert(maxCos <= e(id)._2 + 1e-9, s"vec $id: LSH max_cos above exact")
    }
    // an identical-direction pair shares EVERY SRP half-space, so it
    // collides in every band regardless of the plane draw — recall 1
    assert(l(1L) === ((1L, 1.0)), "identical-direction pair always recalled")
  }

  test("trainMerges: k select→apply rounds, greedy non-overlap apply") {
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c"),
      (3L, "b c"),
      (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TokenizerOps.trainMerges(docs, col("text"), k = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // round 0: "a b"×4 wins; apply merges d1 → [a_b,a_b,a_b], d2 → [a_b,c]
    // round 1: "a_b a_b"×2 wins (greedy: d1's three a_b yield ONE pair
    //          merge → [a_b_a_b, a_b], not two)
    // round 2: all pairs tie at 1 — "a_b c" < "a_b_a_b a_b" < "b c"
    //          (' ' sorts before '_'), tie broken by text ascending
    assert(out.toSeq === Seq((0, "a b", 4L), (1, "a_b a_b", 2L),
      (2, "a_b c", 1L)))
  }

  test("trainMerges: pairless corpus stops early, single round matches q108") {
    val solo = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    assert(TokenizerOps.trainMerges(solo, col("text"), k = 3).count() === 0)
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val one = TokenizerOps.trainMerges(docs, col("text"), k = 1)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val top = TokenizerOps.topMergePairs(docs, col("text"), k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(one.toSeq === top.toSeq, "round 0 selection == topMergePairs")
  }
}
