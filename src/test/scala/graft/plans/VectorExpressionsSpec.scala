package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r13 natives behind the LSH near-dup rebuild (VERDICT r12 item 1):
  * [[SrpCodes]] must be value-identical to the broadcast-join +
  * `sum(when(dot ≥ 0, 1<<p))` coding it replaced (including null-element
  * and whole-null-vector edges), and [[HammingPrunedPairs]] must emit
  * exactly the ordered pairs whose sketches pass the hamming cut. Also
  * pins the r12-ADVICE alignment of [[NearestCentroid]] on whole-null
  * input (lowest centroid id — the join form's nulls-first struct-min). */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def joinFormCodes(corpus: Seq[(Long, Seq[java.lang.Double])],
                            p: Int, bands: Int): Set[(Long, Int, Long)] = {
    // the pre-r13 coding shape, verbatim: broadcast plane join + bit sum
    val df = corpus.toDF("id", "v")
    val pl = df.where(col("id") < p * bands)
      .select((col("id") / p).cast("int").as("band"),
        pmod(col("id"), lit(p.toLong)).cast("int").as("p"),
        col("v").as("p_v"))
    df.join(broadcast(pl))
      .groupBy(col("id"), col("band"))
      .agg(sum(when(call_function("vec_dot", col("v"), col("p_v")) >= 0,
        call_function("shiftleft", lit(1L), col("p")))
        .otherwise(0L)).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  private def srpCodes(corpus: Seq[(Long, Seq[java.lang.Double])],
                       p: Int, bands: Int): Set[(Long, Int, Long)] = {
    val df = corpus.toDF("id", "v")
    val planes = corpus.filter(_._1 < p * bands).sortBy(_._1)
      .map(_._2.map(_.doubleValue()))
    df.select(col("id"),
        posexplode(call_function("srp_codes", col("v"),
          typedLit(planes), lit(p))).as(Seq("band", "bucket")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("srp_codes equals the join-form coding, incl. null-element edges") {
    val rnd = new scala.util.Random(13)
    def v(): Seq[java.lang.Double] =
      Seq.fill(6)(java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1))
    val clean = (0L until 20L).map(i => (i, v()))
    assert(srpCodes(clean, 4, 3) === joinFormCodes(clean, 4, 3))
    // a null ELEMENT nulls that row's dots → bit 0 on every plane, in
    // both forms (the when(...).otherwise(0) arm)
    val withNullElem = clean :+ (20L -> (v().updated(2,
      null: java.lang.Double)))
    assert(srpCodes(withNullElem, 4, 3) === joinFormCodes(withNullElem, 4, 3))
  }

  test("srp_codes: whole-null vector yields the all-zero code per band") {
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 8L).map(i =>
      (i, Seq.fill(4)(java.lang.Double.valueOf(rnd.nextDouble() - 0.5))))
    val planes = corpus.take(8).map(_._2.map(_.doubleValue()))
    val out = (corpus :+ (99L -> (null: Seq[java.lang.Double])))
      .toDF("id", "v")
      .where(col("id") === 99L)
      .select(call_function("srp_codes", col("v"),
        typedLit(planes), lit(4)).as("codes"))
      .head().getSeq[Long](0)
    assert(out === Seq(0L, 0L)) // 2 bands of 4 planes, all bits zeroed
  }

  test("srp_codes sketch tail: packed words are a bit-bijection of the " +
      "first S band codes (hamming preserved)") {
    val rnd = new scala.util.Random(29)
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(6)(java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1))))
    val p = 5; val bands = 6; val s = 4 // 20 sketch bits → 1 word
    val planes = corpus.take(p * bands).map(_._2.map(_.doubleValue()))
    val rows = corpus.toDF("id", "v")
      .select(col("id"), call_function("srp_codes", col("v"),
        typedLit(planes), lit(p), lit(s)).as("cw"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    rows.foreach { case (_, cw) =>
      assert(cw.length === bands + 1) // 6 codes + ceil(20/64)=1 word
      val manual = (0 until s).foldLeft(0L) { (acc, b) =>
        acc | (cw(b) << (b * p))
      }
      assert(cw(bands) === manual, s"packed word mismatch for codes $cw")
    }
    // hamming over packed words == summed per-band hamming over codes
    for (pair <- rows.take(10).toSeq.combinations(2)) {
      val (a, b) = (pair(0)._2, pair(1)._2)
      val packed = java.lang.Long.bitCount(a(bands) ^ b(bands))
      val perBand = (0 until s).map(i =>
        java.lang.Long.bitCount(a(i) ^ b(i))).sum
      assert(packed === perBand)
    }
  }

  test("hamming_pruned_pairs: emits exactly the pairs under the cut") {
    // entries sorted by pk; sketches chosen so hamming distances are
    // (1,2): 1 bit, (1,3): 2 bits, (2,3): 3 bits, x-with-null-sk: 0
    val entries = Seq(
      (1L, Seq(0L, 0L)),
      (2L, Seq(1L, 0L)),      // 1 bit from id 1
      (3L, Seq(3L, 4L)))      // 3 bits from id 1? (0b11, 0b100) → 2+1 = 3
    val df = Seq(Tuple1(entries)).toDF("es")
      .select(transform(col("es"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("sk"))).as("es"))
    def pairsAt(h: Int): Set[(Long, Long)] =
      df.select(call_function("hamming_pruned_pairs", col("es"), lit(h))
          .as(Seq("p1", "p2")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // distances: (1,2)=1, (1,3)=3, (2,3)=1^3=2 plus 4 → popcount(2)+popcount(4)=2
    assert(pairsAt(0) === Set.empty)
    assert(pairsAt(1) === Set((1L, 2L)))
    assert(pairsAt(2) === Set((1L, 2L), (2L, 3L)))
    assert(pairsAt(3) === Set((1L, 2L), (2L, 3L), (1L, 3L)))
    // hMax ≥ bits → degrades to the full pairs_of_sorted fan-out
    assert(pairsAt(128) === Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("hamming_pruned_pairs: empty input emits nothing; null sk passes") {
    val empty = Seq(Tuple1(Seq.empty[(Long, Seq[Long])])).toDF("es")
      .select(transform(col("es"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("sk"))).as("es"))
    assert(empty.select(call_function("hamming_pruned_pairs", col("es"),
      lit(0)).as(Seq("p1", "p2"))).count() === 0)
    // null sketches ham as zero bits — the prune degrades to no-op
    // rather than dropping pairs on missing sketch data
    val nullSk = Seq(Tuple1(Seq((1L, null: Seq[Long]), (2L, null: Seq[Long]))))
      .toDF("es")
      .select(transform(col("es"), e =>
        struct(e.getField("_1").as("id"), e.getField("_2").as("sk"))).as("es"))
    val got = nullSk.select(call_function("hamming_pruned_pairs", col("es"),
        lit(0)).as(Seq("p1", "p2")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("nearest_centroid: whole-null v assigns the LOWEST centroid id " +
      "(join-form nulls-first struct-min, ADVICE r12)") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val out = Seq((7L, null: Seq[java.lang.Double]),
        (8L, Seq[java.lang.Double](0.1, 0.9)))
      .toDF("id", "v")
      .select(col("id"), call_function("nearest_centroid", col("v"),
        typedLit(Seq(3L, 5L)), typedLit(Seq(1.0, 1.0)),
        typedLit(cents)).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(7L) === 3L) // null v → nulls-first tie → lowest cid
    assert(out(8L) === 5L) // real argmin unaffected
  }
}
