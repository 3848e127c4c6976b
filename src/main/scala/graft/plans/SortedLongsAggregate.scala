package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Growable primitive long buffer — [[DoubleBuf]]'s shape (append =
  * array store with amortised doubling, merge = one arraycopy,
  * (de)serialise = flat 8-bytes-per-value ByteBuffer), for long values. */
final class LongBuf(var xs: Array[Long], var n: Int) {
  private def ensure(cap: Int): Unit =
    if (cap > xs.length)
      xs = java.util.Arrays.copyOf(xs,
        math.max(cap, math.max(16, xs.length * 2)))
  def add(v: Long): Unit = { ensure(n + 1); xs(n) = v; n += 1 }
  def addAll(o: LongBuf): Unit = {
    ensure(n + o.n); System.arraycopy(o.xs, 0, xs, n, o.n); n += o.n
  }
  def sortedArray: Array[Long] = {
    val out = java.util.Arrays.copyOf(xs, n)
    java.util.Arrays.sort(out)
    out
  }
}

/** `sorted_longs_agg(v)` — `array_sort(collect_list(v))` for long inputs
  * as a native [[TypedImperativeAggregate]] over a primitive long array.
  *
  * Built for the q26 posting-list aggregate (the widest shuffle in the
  * engine: one group per distinct shingle, one packed (id, n_sh) long per
  * posting entry). `collect_list` runs under the same
  * `ObjectHashAggregateExec`, but its buffer is an `ArrayBuffer[Any]` —
  * a box per entry on update, a boxed traversal per partial/merge
  * serialisation, and then a separate `array_sort` projection pass over
  * the assembled arrays. Here update is a primitive array store, merge an
  * arraycopy, serialize a flat ByteBuffer, and the sort happens once at
  * eval on the final primitive array (`UnsafeArrayData.fromPrimitiveArray`
  * keeps the output unboxed too). Same shape as [[GrubbsAggregate]],
  * which measured 1.9× on q58 replacing the boxed buffer.
  *
  * Null inputs are skipped (matches `collect_list` semantics). Output
  * ordering is ascending — callers get the `array_sort` contract for
  * free, which [[SortedPairs]] requires.
  */
case class SortedLongsAggregate(child: Expression,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongBuf] with UnaryLike[Expression] {

  override def createAggregationBuffer(): LongBuf =
    new LongBuf(new Array[Long](8), 0)

  override def update(b: LongBuf, input: InternalRow): LongBuf = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b1: LongBuf, b2: LongBuf): LongBuf = {
    b1.addAll(b2); b1
  }

  override def eval(b: LongBuf): Any =
    UnsafeArrayData.fromPrimitiveArray(b.sortedArray)

  override def serialize(b: LongBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.xs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val xs = new Array[Long](math.max(8, n))
    var i = 0
    while (i < n) { xs(i) = bb.getLong; i += 1 }
    new LongBuf(xs, n)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sorted_longs_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedLongsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedLongsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `posting_flat_agg(id, sk)` — the (band, bucket) posting-list aggregate
  * of the LSH near-dup pipeline (q91/q102) as a native
  * [[TypedImperativeAggregate]] over ONE flat primitive long buffer.
  *
  * Replaces `array_sort(collect_list(struct(id, sk)))`, whose costs the
  * ×100 probe leg measured as the pipeline's largest constant (~45 s of
  * 62.6 s at 95 M posting entries, SCALING.md r13): a boxed struct copy
  * per entry on update, a boxed traversal per partial/merge serialisation,
  * and a comparator-driven `array_sort` pass over assembled struct arrays.
  * Here each entry is `1 + |sk|` primitive longs `[id, sk...]` appended
  * flat (update = bounds check + array stores, merge = one arraycopy,
  * (de)serialise = flat ByteBuffer), and NO sort happens at all: the
  * consumer [[HammingPairsFlat]] emits each surviving pair as
  * (least, greatest), so list order — which only ever came from
  * collect_list's arrival order — cannot reach the output. Output is the
  * flat `array<bigint>` itself; entry count = size/width (the bucket-cap
  * filter scales its bounds by the width, an exact rewrite since size is
  * always a multiple of the width).
  *
  * The sketch width is fixed per query (`ceil(S·p/64)` words, a plan-time
  * constant) and passed as `width`; a row whose `sk` disagrees fails
  * loudly rather than corrupting record framing. Null ids/sketches cannot
  * occur by construction (both are projections of non-null `srp_codes`
  * output) — nulls fail loudly too. */
case class FlatPostingAggregate(id: Expression, sk: Expression, width: Int,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongBuf]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def left: Expression = id
  override def right: Expression = sk

  override def createAggregationBuffer(): LongBuf =
    new LongBuf(new Array[Long](16), 0)

  override def update(b: LongBuf, input: InternalRow): LongBuf = {
    val idV = id.eval(input)
    val skV = sk.eval(input)
    require(idV != null && skV != null,
      "posting_flat_agg: null id/sketch (srp_codes output is non-null)")
    val arr = skV.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(arr.numElements() == width - 1,
      s"posting_flat_agg: sketch width ${arr.numElements()} != ${width - 1}")
    b.add(idV.asInstanceOf[Long])
    var k = 0
    while (k < width - 1) { b.add(arr.getLong(k)); k += 1 }
    b
  }

  override def merge(b1: LongBuf, b2: LongBuf): LongBuf = {
    b1.addAll(b2); b1
  }

  override def eval(b: LongBuf): Any =
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(b.xs, b.n))

  override def serialize(b: LongBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.xs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val xs = new Array[Long](math.max(16, n))
    var i = 0
    while (i < n) { xs(i) = bb.getLong; i += 1 }
    new LongBuf(xs, n)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "posting_flat_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): FlatPostingAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FlatPostingAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(id = newLeft, sk = newRight)
}
