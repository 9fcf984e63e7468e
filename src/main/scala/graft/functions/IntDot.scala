package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact integer dot product of two long-array columns — the
  * fixed-point twin of [[DotProduct]]. Sum order is irrelevant in the
  * integer domain, so unlike the double fold there is no operation-
  * order contract to preserve; the only contract is exactness (callers
  * in VectorOps bound coordinates so products stay below 2^52 and the
  * 64-term sum below 2^58 — no overflow).
  *
  * Why an Expression: the aggregate/zip_with form evaluates two
  * interpreted lambdas per element and allocates the zipped array per
  * row. The quantized ANN family (c07b/c12/c22/c25/c26) computes up
  * to K=16 such dots per corpus row in its assignment passes, so the
  * interpreter tax multiplies; this compiles to one fused primitive
  * loop inside the stage. */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_intdot expects two bigint arrays, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += aa.getLong(i) * bb.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_intdot"
}
