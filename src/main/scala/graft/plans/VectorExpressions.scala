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
