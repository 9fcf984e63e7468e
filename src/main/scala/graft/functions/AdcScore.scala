package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) score of a PQ code array against a
  * per-query lookup table: `graft_adc(codes, lut, ksub)` =
  * Σ_m lut[m·ksub + codes[m]] — exactly the element_at fold of the
  * relational form (VectorOps pqAdcScan), in the integer domain, so
  * the DuckDB oracle's replay stays bit-identical.
  *
  * Why an Expression: the fold form re-walks an interpreted lambda
  * tree per (query, vector) pair — the innermost loop of every ADC
  * scan (c22/c22b/c22c/c26/c26b). This compiles to `subs` array reads
  * and adds inside whole-stage codegen. */
case class AdcScore(codes: Expression, lut: Expression, ksubE: Expression)
    extends TernaryExpression {

  override def first: Expression = codes
  override def second: Expression = lut
  override def third: Expression = ksubE

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (codes.dataType, lut.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _))
          if ksubE.dataType == IntegerType && ksubE.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "graft_adc expects (array<int>, array<bigint>, foldable int)")
    }

  override protected def nullSafeEval(c: Any, l: Any, k: Any): Any = {
    val cs = c.asInstanceOf[ArrayData]
    val lt = l.asInstanceOf[ArrayData]
    val ksub = k.asInstanceOf[Int]
    var acc = 0L
    var m = 0
    val n = cs.numElements()
    while (m < n) {
      acc += lt.getLong(m * ksub + cs.getInt(m))
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l, k) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $c.numElements();
         |long $acc = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  $acc += $l.getLong($m * $k + $c.getInt($m));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AdcScore =
    copy(codes = newFirst, lut = newSecond, ksubE = newThird)

  override def prettyName: String = "graft_adc"
}
