package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product of two numeric arrays, in DOUBLE, as a
  * sequential left fold — the same operation order as
  * graft.functions.Portable.dot (the aggregate/zip_with form) and the
  * DuckDB oracle's list_reduce, so all three produce bit-identical
  * IEEE results.
  *
  * Why an Expression and not the higher-order-function form: HOFs
  * evaluate a lambda per element through the interpreter (no
  * whole-stage codegen), allocating per-row intermediate arrays. This
  * generates a tight primitive loop inside the stage — the difference
  * is ~5× on the ANN scans (BENCH c05/c06/c07), which matters when
  * the corpus is 10^9 vectors.
  *
  * Elements are assumed non-null (embedding vectors); a null array on
  * either side yields null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two float/double arrays, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, e: Expression): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, i, left)} * ${get(b, i, right)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
