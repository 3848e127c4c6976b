package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Streaming pair iterator over one posting list: emits the m·(m−1)/2
  * ordered pairs (a(i), a(j)), i < j, of a sorted long array. The output
  * row is a single REUSED two-long holder — the consumer (the generated
  * `while (it.hasNext())` loop in `GenerateExec.codeGenIterableOnce`, or
  * the interpreted `flatMap` → `UnsafeProjection` path) reads both fields
  * before requesting the next row, the same streaming contract Spark's
  * own row-reusing iterators rely on, so per-pair allocation is zero. */
final class SortedPairsIterator(a: Array[Long]) extends Iterator[InternalRow] {
  private[this] val n = a.length
  private[this] var i = 0
  private[this] var j = 1
  private[this] val row = new LongPairRow
  override def hasNext: Boolean = j < n
  override def next(): InternalRow = {
    row.p1 = a(i); row.p2 = a(j)
    j += 1
    if (j == n) { i += 1; j = i + 1 }
    row
  }
}

/** Minimal two-long [[InternalRow]] for [[SortedPairsIterator]] — field
  * storage is two primitive vars (no `Array[Any]` boxing). Only the
  * accessors the Generate consumers use are implemented; everything else
  * is a deliberate `UnsupportedOperationException` so a misuse fails
  * loudly rather than silently reading garbage. */
final class LongPairRow extends InternalRow {
  var p1: Long = 0L
  var p2: Long = 0L
  override def numFields: Int = 2
  override def isNullAt(ordinal: Int): Boolean = false
  override def getLong(ordinal: Int): Long = if (ordinal == 0) p1 else p2
  override def copy(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](p1, p2))
  override def setNullAt(i: Int): Unit = unsupported()
  override def update(i: Int, value: Any): Unit = unsupported()
  override def getBoolean(i: Int): Boolean = unsupported()
  override def getByte(i: Int): Byte = unsupported()
  override def getShort(i: Int): Short = unsupported()
  override def getInt(i: Int): Int = unsupported()
  override def getFloat(i: Int): Float = unsupported()
  override def getDouble(i: Int): Double = unsupported()
  override def getDecimal(i: Int, precision: Int, scale: Int): org.apache.spark.sql.types.Decimal = unsupported()
  override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String = unsupported()
  override def getBinary(i: Int): Array[Byte] = unsupported()
  override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval = unsupported()
  override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal = unsupported()
  override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal = unsupported()
  override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal = unsupported()
  override def getStruct(i: Int, numFields: Int): InternalRow = unsupported()
  override def getArray(i: Int): ArrayData = unsupported()
  override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData = unsupported()
  override def get(i: Int, dataType: DataType): AnyRef =
    java.lang.Long.valueOf(getLong(i))
  private def unsupported(): Nothing =
    throw new UnsupportedOperationException("LongPairRow supports getLong only")
}

/** Codegen entry point for [[SortedPairs]]: the generated code constructs
  * one of these per input row; `GenerateExec.codeGenIterableOnce` then
  * calls `.iterator()` and drives the streaming loop. */
final class SortedPairsIterable(arr: ArrayData) extends Iterable[InternalRow] {
  override def iterator: Iterator[InternalRow] =
    if (arr == null) Iterator.empty
    else new SortedPairsIterator(arr.toLongArray())
}

/** [[SortedPairsIterator]] with the Jaccard size-compatibility cut
  * (r14, guide §2.3 "shuffle fewer bytes" at the emission site): each
  * packed value carries the doc's shingle count in its low `nshBits`
  * bits, and a pair whose sizes satisfy min/max < minRatio can never
  * reach the Jaccard threshold (i ≤ min(n1,n2), jac monotone in i, so
  * jac ≤ min/max), so it is skipped BEFORE the count aggregate instead
  * of after it. The filter is two mask-ANDs and one multiply per pair —
  * far cheaper than the hash-aggregate update each emitted pair costs. */
final class SizeCutPairsIterator(a: Array[Long], nshBits: Int,
                                 minRatio: Double) extends Iterator[InternalRow] {
  private[this] val n = a.length
  private[this] val mask = (1L << nshBits) - 1
  private[this] var i = 0
  private[this] var j = 0
  private[this] val row = new LongPairRow
  private[this] var has = false
  advance()
  private def advance(): Unit = {
    has = false
    var ii = i; var jj = j
    while (true) {
      jj += 1
      if (jj >= n) {
        ii += 1; jj = ii + 1
        if (jj >= n) { i = ii; j = jj; return }
      }
      val n1 = a(ii) & mask; val n2 = a(jj) & mask
      val lo = if (n1 < n2) n1 else n2
      val hi = if (n1 < n2) n2 else n1
      if (lo >= minRatio * hi) { i = ii; j = jj; has = true; return }
    }
  }
  override def hasNext: Boolean = has
  override def next(): InternalRow = {
    row.p1 = a(i); row.p2 = a(j)
    advance()
    row
  }
}

final class SizeCutPairsIterable(arr: ArrayData, nshBits: Int,
                                 minRatio: Double) extends Iterable[InternalRow] {
  override def iterator: Iterator[InternalRow] =
    if (arr == null) Iterator.empty
    else new SizeCutPairsIterator(arr.toLongArray(), nshBits, minRatio)
}

/** `pairs_of_sorted(ids)` — the tier-b custom Generator the r9 VERDICT
  * ordered for q26 (item 1): emits every ordered pair (p1, p2), p1 < p2
  * by array position, of a SORTED `array<long>` posting list.
  *
  * Replaces the interpreted `explode(flatten(transform(ids, (x, i) =>
  * transform(slice(...), ...))))` HOF chain in the df-capped n-gram
  * Jaccard candidate stage: higher-order functions are `CodegenFallback`
  * and the chain materialises a nested array-of-struct-arrays plus a
  * flatten copy per posting list. A two-Generate rewrite (posexplode +
  * explode-of-slice) IS codegen'd but must carry the full `ids` array
  * through every intermediate row — over the cached posting relation the
  * InMemoryTableScan boundary splits its two codegen stages and the
  * carried array materialises per element, the measured r9 regression
  * (sf10 113.6 → 141 s). This Generator is one codegen'd loop
  * (`GenerateExec.codeGenIterableOnce`): no nested arrays, no carried
  * `ids` column, and the emitted row is a reused primitive two-long
  * holder, so the pair stream allocates nothing per pair.
  *
  * Ordering contract: the input must already be sorted ascending (the
  * posting aggregate sorts at eval — [[SortedLongsAggregate]]); pairs
  * come out with p1 < p2 because position order IS value order. Null or
  * empty input emits nothing (matches `explode` of an empty array).
  */
case class SortedPairs(child: Expression)
    extends Generator with UnaryLike[Expression] {

  override def elementSchema: StructType = StructType(Seq(
    StructField("p1", LongType, nullable = false),
    StructField("p2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pairs_of_sorted expects array<bigint>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input).asInstanceOf[ArrayData]
    if (data == null) Iterator.empty
    else new SortedPairsIterator(data.toLongArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = classOf[SortedPairsIterable].getName
    ev.copy(
      code = code"""
        |${childGen.code}
        |$cls ${ev.value} = new $cls(
        |  ${childGen.isNull} ? null : ${childGen.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "pairs_of_sorted"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pairs_of_sorted_sizecut(ids, nshBits, minRatio)` — [[SortedPairs]]
  * plus the size-compatibility cut of [[SizeCutPairsIterator]]. Exactness
  * argument (why dropping at generation equals dropping at the filter):
  * the downstream legs keep a pair iff `round(jac', 4) >= threshold`
  * where jac' is evaluated at some i' ≤ min(n1, n2); jac is monotone in
  * i and round is monotone, so `round(min/max, 4) < threshold` implies
  * every downstream test fails. Callers pass
  * `minRatio = threshold − 5.1e-5`: with HALF_UP rounding at 4 decimals,
  * `round4(x) ≥ t ⟺ x ≥ t − 5e-5` (t on the 1e-4 grid), and the extra
  * 1e-6 guards double-representation error on the CONSERVATIVE side —
  * a falsely kept pair costs one aggregate row, a falsely dropped pair
  * would change results. */
case class SortedPairsSizeCut(child: Expression, nshBits: Int,
                              minRatio: Double)
    extends Generator with UnaryLike[Expression] {

  override def elementSchema: StructType = StructType(Seq(
    StructField("p1", LongType, nullable = false),
    StructField("p2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pairs_of_sorted_sizecut expects array<bigint>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input).asInstanceOf[ArrayData]
    if (data == null) Iterator.empty
    else new SizeCutPairsIterator(data.toLongArray(), nshBits, minRatio)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = classOf[SizeCutPairsIterable].getName
    val ratio = java.lang.Double.toString(minRatio)
    ev.copy(
      code = code"""
        |${childGen.code}
        |$cls ${ev.value} = new $cls(
        |  ${childGen.isNull} ? null : ${childGen.value}, $nshBits, ${ratio}D);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "pairs_of_sorted_sizecut"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
