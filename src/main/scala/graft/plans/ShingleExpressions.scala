package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_shingles(text, n)` — one-pass native distinct word n-gram
  * shingling, semantically identical to the declarative chain
  *
  * {{{
  *   tk = split(trim(regexp_replace(lower(text), " +", " ")), " ")
  *   when(size(tk) >= n, array_distinct(transform(sequence(0, size(tk)-n),
  *     i => concat_ws(" ", tk[i+1], ..., tk[i+n]))))
  *     .otherwise(array())
  * }}}
  *
  * (= [[graft.functions.TextFunctions.shinglesOfTokens]] over
  * [[graft.functions.TextFunctions.tokens]], = the DuckDB
  * `shinglesSql` twin — the oracle contract is untouched).
  *
  * Why native (r10, VERDICT r9 item 1 context): the tokenize+explode
  * SCAN was the single widest cost in every shingle pipeline pass
  * (30.8 s of the q26 sf10 budget — docs/SCALING.md r9), and the
  * declarative chain pays it in pieces: a regexp engine pass to squeeze
  * spaces, a `split` building one UTF8String per token, then an
  * interpreted `transform` lambda (HigherOrderFunction is
  * CodegenFallback) evaluating n `element_at` + one `concat_ws` PER
  * SHINGLE, then `array_distinct`'s per-element scan. This expression is
  * one byte-level scan: lowercase once (`UTF8String.toLowerCase`, the
  * same collation `lower()` uses), find token runs between 0x20 bytes
  * (UTF-8 continuation bytes are ≥ 0x80, so byte scanning is
  * multibyte-safe), emit each shingle as a SLICE of the lowered byte
  * array when its n tokens are single-space-contiguous in the original
  * text (the overwhelming case — zero copy) or as one small join buffer
  * otherwise, and dedup via hash set keeping first-occurrence order
  * (`array_distinct`'s order).
  *
  * Split semantics pinned by spec: an empty/all-space document yields
  * ONE empty token (`split("", " ") = [""]`), so n = 1 shingles it to
  * `[""]` and n ≥ 2 to `[]`; a null document yields `[]` (the `when`
  * chain's CaseWhen-null → otherwise branch), so the output is
  * non-nullable.
  */
case class NgramShingles(child: Expression, n: Int,
                         distinct: Boolean = true) extends UnaryExpression {

  require(n >= 1, s"ngram_shingles: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (distinct) "ngram_shingles" else "ngram_list"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles expects a string column, got ${t.catalogString}")
  }

  // not nullSafeEval: null input maps to an EMPTY ARRAY, not null
  override def eval(input: InternalRow): Any =
    NgramShingles.compute(child.eval(input).asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = NgramShingles.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  $cls.compute(${childGen.isNull} ? null : ${childGen.value}, $n, $distinct);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramShingles {

  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Static entry point shared by eval and codegen. `distinct = false`
    * (`ngram_list`) keeps every occurrence in order — the multiplicity
    * variant corpus-level counting (BPE merge selection, q108) needs. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (text == null) return Empty
    val s = text.toLowerCase
    val bytes = s.getBytes
    val len = bytes.length

    // Token spans: starts(k) inclusive, ends(k) exclusive, over runs of
    // non-space bytes. Worst case (len+1)/2 tokens.
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
    // split("", " ") = [""]: an empty/all-space document has ONE empty
    // token. Only reachable into the output when n == 1.
    if (tCount == 0) {
      return if (n == 1) new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
      else Empty
    }
    if (tCount < n) return Empty

    val out = new java.util.ArrayList[AnyRef](tCount - n + 1)
    val seen = if (!distinct) null else new java.util.HashSet[UTF8String](
      math.max(4, (tCount - n + 1) * 2))
    var k = 0
    while (k <= tCount - n) {
      // expected shingle length: token bytes + (n-1) single separators
      var shLen = n - 1
      var j = k
      while (j < k + n) { shLen += ends(j) - starts(j); j += 1 }
      val span = ends(k + n - 1) - starts(k)
      val shingle =
        if (span == shLen) {
          // tokens are single-space-contiguous in the source: zero-copy
          // slice over the lowered byte array
          UTF8String.fromBytes(bytes, starts(k), shLen)
        } else {
          val buf = new Array[Byte](shLen)
          var pos = 0
          var t = k
          while (t < k + n) {
            if (t > k) { buf(pos) = ' '; pos += 1 }
            val l = ends(t) - starts(t)
            System.arraycopy(bytes, starts(t), buf, pos, l)
            pos += l
            t += 1
          }
          UTF8String.fromBytes(buf)
        }
      if (seen == null || seen.add(shingle)) out.add(shingle)
      k += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpeish_count(text)` — one-pass native BPE-ish subword token count,
  * value-identical to the declarative form it replaces:
  *
  * {{{ regexp_count(lower(text), "[a-z]+|[0-9]+|[^a-z0-9 ]") }}}
  *
  * (= [[graft.functions.TextFunctions.bpeishCount]], = the DuckDB
  * `len(regexp_extract_all(lower(e), …))` twin — the oracle contract is
  * untouched).
  *
  * Why native (r13): the alternation regex walks java.util.regex's
  * backtracking machinery at EVERY position of every document — the
  * whole q105 sequence-packing budget at sf10 is this scan (the window
  * cumsum downstream shuffles three longs per doc). The count has a
  * trivial closed form over the lowered bytes: a maximal [a-z] run
  * counts 1 (greedy `[a-z]+` with nothing following is maximal), a
  * maximal digit run counts 1, every OTHER code point except ' '
  * counts 1 (`[^a-z0-9 ]` matches per code point — start bytes only;
  * UTF-8 continuation bytes are (b & 0xC0) == 0x80), and a space
  * matches nothing. Lowercasing uses the same `UTF8String.toLowerCase`
  * collation `lower()` compiles to, so case/Unicode behavior is
  * byte-identical to the regexp form. Null text → null (regexp_count's
  * null propagation).
  */
case class BpeishCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpeish_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpeish_count expects a string column, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeishCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeishCount.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeishCount {
  /** The scan: run-state machine over the lowered UTF-8 bytes.
    * run = 0 none, 1 alpha, 2 digit. */
  def compute(s0: UTF8String): Int = {
    val b = s0.toLowerCase.getBytes
    var cnt = 0
    var run = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') { if (run != 1) { cnt += 1; run = 1 } }
      else if (c >= '0' && c <= '9') { if (run != 2) { cnt += 1; run = 2 } }
      else if (c == ' ') run = 0
      else { if ((c & 0xC0) != 0x80) cnt += 1; run = 0 }
      i += 1
    }
    cnt
  }
}
