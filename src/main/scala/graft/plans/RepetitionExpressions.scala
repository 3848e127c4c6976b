package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `repetition_stats(text)` — one-pass native within-document repetition
  * counters: `struct<n_tok: bigint, n_distinct: bigint, top_bigram:
  * bigint>` over the same tokenization contract as
  * [[graft.functions.TextFunctions.tokens]] (lower → squeeze runs of
  * 0x20 → trim → split on single space; an empty/all-space document is
  * ONE empty token, `split("", " ") = [""]`).
  *
  * `n_tok` counts tokens, `n_distinct` distinct token values,
  * `top_bigram` the multiplicity of the most frequent adjacent word
  * bigram (0 when fewer than two tokens). These are exactly the inputs
  * of the Gopher-style repetition signals in
  * [[graft.operators.CorpusFilter.repetitionProfile]]: dup-token
  * fraction `1 − n_distinct/n_tok` and top-bigram share
  * `top_bigram/(n_tok−1)`.
  *
  * Why native (r10): the declarative form explodes `n_tok − 1` bigram
  * rows per document through TWO shuffled hash aggregates (by
  * (doc, gram) then doc) just to take a per-document max — a corpus-
  * sized shuffle for a row-local statistic. This expression computes
  * all three counters in one byte-level scan per document (token spans
  * over the lowered bytes as in [[NgramShingles]], distinct via a hash
  * set of zero-copy slices, bigram counts via a small per-document hash
  * map), turning q106 into a map-only projection: zero shuffles at any
  * corpus size. Equivalence with the declarative chain is pinned by
  * `RepetitionStatsSpec` (property test) and the unchanged q106 DuckDB
  * oracle.
  *
  * Null text yields a null struct (the declarative chain nulls every
  * downstream column the same way).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects a string column, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RepetitionStats.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false)))

  /** Static entry point shared by eval and codegen. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toLowerCase
    val bytes = s.getBytes
    val len = bytes.length

    // token spans over runs of non-space bytes (multibyte-safe: UTF-8
    // continuation bytes are >= 0x80, never 0x20)
    var tCount = 0
    var starts = new Array[Int](math.min(16, len / 2 + 1))
    var ends = new Array[Int](starts.length)
    var i = 0
    while (i < len) {
      if (bytes(i) != ' ') {
        val start = i
        while (i < len && bytes(i) != ' ') i += 1
        if (tCount == starts.length) {
          starts = java.util.Arrays.copyOf(starts, starts.length * 2)
          ends = java.util.Arrays.copyOf(ends, ends.length * 2)
        }
        starts(tCount) = start; ends(tCount) = i; tCount += 1
      } else i += 1
    }
    // split("", " ") = [""]: one empty token, no bigram
    if (tCount == 0) return new GenericInternalRow(Array[Any](1L, 1L, 0L))

    val distinct = new java.util.HashSet[UTF8String](tCount * 2)
    var k = 0
    while (k < tCount) {
      distinct.add(UTF8String.fromBytes(bytes, starts(k), ends(k) - starts(k)))
      k += 1
    }

    var top = 0L
    if (tCount >= 2) {
      val counts = new java.util.HashMap[UTF8String, Array[Int]](tCount * 2)
      k = 0
      while (k < tCount - 1) {
        // bigram = tk(k) + " " + tk(k+1): zero-copy slice when the two
        // tokens are single-space-contiguous in the source, else a
        // 2-token join buffer (same trick as NgramShingles)
        val shLen = (ends(k) - starts(k)) + 1 + (ends(k + 1) - starts(k + 1))
        val span = ends(k + 1) - starts(k)
        val bigram =
          if (span == shLen) UTF8String.fromBytes(bytes, starts(k), shLen)
          else {
            val buf = new Array[Byte](shLen)
            val l0 = ends(k) - starts(k)
            System.arraycopy(bytes, starts(k), buf, 0, l0)
            buf(l0) = ' '
            System.arraycopy(bytes, starts(k + 1), buf, l0 + 1,
              ends(k + 1) - starts(k + 1))
            UTF8String.fromBytes(buf)
          }
        var c = counts.get(bigram)
        if (c == null) { c = new Array[Int](1); counts.put(bigram, c) }
        c(0) += 1
        if (c(0) > top) top = c(0)
        k += 1
      }
    }
    new GenericInternalRow(Array[Any](tCount.toLong, distinct.size.toLong, top))
  }
}
