package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric arrays (SURVEY Ext: similarity
  * search — the custom-`Expression` tier the brute-force/LSH/IVF paths
  * call per candidate pair).
  *
  * Bit-exact contract: accumulates left-to-right in double, each element
  * cast to double first — the same IEEE sequence as the
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` HOF it replaces
  * and as the DuckDB oracle's positional-unnest ordered sum
  * ([[graft.operators.Similarity.dotSql]]). The HOF evaluated its
  * lambdas interpreted, per element, per pair — replacing it with this
  * codegen loop cut the block-local cosine bench (q46) by ~4×.
  *
  * Contract notes: arrays of unequal length fold over the common prefix
  * (the HOF version returned null via zip_with's null padding — no
  * caller compares unequal-length vectors); a null ELEMENT on either
  * side makes the whole result null, exactly as the HOF's `acc + null`
  * did. Non-float/double element types are rejected at ANALYSIS time
  * (the HOF accepted any castable numeric — pre-cast such arrays to
  * `array<double>` at the call site).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects two array<float|double> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, i: String, t: DataType): String =
        if (t == FloatType) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ${get(a, i, elemType(left))} * ${get(b, i, elemType(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Map-only IVF cell assignment (r12): `nearest_centroid(v)` with the
  * K-centroid matrix held as expression state (one broadcast-sized
  * reference object per task, not one row per (vector, centroid)).
  *
  * Replaces [[graft.operators.Similarity.ivfAssign]]'s
  * `base.join(broadcast(cents))` fan-out: that shape materializes BOTH
  * 64-dim vectors on every one of the n×K joined rows before the argmin
  * aggregate — ~113 GB of row traffic at 220 k vectors × 860 cells,
  * measured 274.9 s for the q113 semDedup probe leg (DiagSem r12). Here
  * the argmin runs as a tight compiled loop inside one projection: n
  * rows, K·d multiply-adds each, zero shuffle, zero fan-out.
  *
  * Bit-exact contract with the join form it replaces:
  * `min(struct(cn2 − 2·v·c AS s, c_id))` — per-centroid dot accumulated
  * left-to-right in double ([[DotProduct]]'s IEEE sequence), lexicographic
  * (s, c_id) minimum with s ordered nulls-first (a null element in `v`
  * nulls the dot, and the old struct-min sorted null s before every
  * real s). Null or missing `v` → null cell. Empty centroid set →
  * null (callers guard K ≥ 8 by contract).
  */
case class NearestCentroid(child: Expression, cids: Array[Long],
                           cn2s: Array[Double], cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<double> (cast at the call site), " +
        s"got ${t.catalogString}")
  }

  /** The argmin loop — shared by eval and codegen (the generated code
    * makes one virtual call per row; the loop body is JIT-compiled). */
  def assign(v: ArrayData): java.lang.Long = {
    if (cids.length == 0) return null
    var found = false
    var bestNull = false
    var bestS = 0.0
    var bestId = 0L
    var j = 0
    while (j < cids.length) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var sNull = false
      var i = 0
      while (i < n && !sNull) {
        if (v.isNullAt(i)) sNull = true
        else { acc += v.getDouble(i) * c(i); i += 1 }
      }
      val s = cn2s(j) - 2.0 * acc
      val wins =
        if (!found) true
        else {
          val cmp =
            if (sNull && bestNull) 0
            else if (sNull) -1 // nulls-first: null s beats any real s
            else if (bestNull) 1
            else java.lang.Double.compare(s, bestS)
          if (cmp != 0) cmp < 0 else cids(j) < bestId
        }
      if (wins) { found = true; bestNull = sNull; bestS = s; bestId = cids(j) }
      j += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val r = assign(input.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    val cell = ctx.freshName("cell")
    nullSafeCodeGen(ctx, ev, v => s"""
       |java.lang.Long $cell = $ref.assign($v);
       |if ($cell == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $cell.longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
