package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_sum_strlen(arr)` — Σ length(x) over the string array (character
  * count, like Spark's `length`), as the interpreted fold
  * `aggregate(arr, 0L, (a, x) -> a + length(x))` computed it on t19's
  * mean-word-length gate: null array → null, and a null ELEMENT
  * poisons the fold to null (`a + null`), reproduced exactly so the
  * swap is bit-identical on any input (SumStrLenSpec pins it; the
  * rule-gate's split() arrays never carry nulls in practice).
  *
  * Why an Expression: same [[CountIn]]/[[CountRlike]] rationale — the
  * fold ran an interpreted per-token lambda on the corpus-wide rule
  * scan; this is one fused numChars loop in the scan's codegen. */
case class SumStrLen(arr: Expression) extends UnaryExpression {

  override def child: Expression = arr

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = arr.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sum_strlen expects array<string>, got ${t.catalogString}")
  }

  // a null element yields a null SUM (the fold's `a + null` shape),
  // not just a skipped element — so the expression is null-producing
  // even on a non-null array and must evaluate via the boxed path.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SumStrLen.sum(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("sumBoxed")
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Long $boxed = (java.lang.Long) graft.functions.SumStrLen.sum($a);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SumStrLen =
    copy(arr = newChild)

  override def prettyName: String = "graft_sum_strlen"
}

object SumStrLen {

  /** Boxed so the null-poisoning corner survives codegen: null when
    * any element is null, else the Long sum of numChars. */
  def sum(arr: ArrayData): Any = {
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}
