package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Collapse adjacent equal elements of a string array to the first of
  * each run — t38's de-repetition kernel (`a a a b a` → `a b a`).
  * Null elements compare null-safely (a run of nulls collapses too),
  * matching the `<=>` the HOF formulation used.
  *
  * Why an Expression: the higher-order-function form
  * (`filter(t, (x, i) -> i = 0 OR NOT (x <=> try_element_at(t, i)))`)
  * evaluates an interpreted two-argument lambda plus a positional
  * array lookup PER TOKEN — and because the downstream
  * `n_kept < n_tok` filter is substituted below the sort, per token
  * TWICE. This compiles to one fused comparison loop inside the
  * stage; t38 went 5.7 s → 0.85 s warm at sf0.1 (the lambda
  * interpreter tax was the whole cost — see BASELINE.md). */
case class CollapseRuns(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_collapse_runs expects array<string>, got ${t.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tmp = new Array[Any](n)
    var k = 0
    var prev: UTF8String = null
    var first = true
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val eq = !first &&
        (if (cur == null) prev == null else prev != null && cur.equals(prev))
      if (!eq) { tmp(k) = cur; k += 1 }
      prev = cur
      first = false
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      tmp.asInstanceOf[Array[AnyRef]], k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val tmp = ctx.freshName("tmp")
      val prev = ctx.freshName("prev")
      val first = ctx.freshName("first")
      val cur = ctx.freshName("cur")
      val eq = ctx.freshName("eq")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $n = $a.numElements();
         |Object[] $tmp = new Object[$n];
         |int $k = 0;
         |$utf8 $prev = null;
         |boolean $first = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  $utf8 $cur = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  boolean $eq = !$first && ($cur == null
         |    ? $prev == null : ($prev != null && $cur.equals($prev)));
         |  if (!$eq) { $tmp[$k++] = $cur; }
         |  $prev = $cur;
         |  $first = false;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($tmp, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CollapseRuns =
    copy(child = newChild)

  override def prettyName: String = "graft_collapse_runs"
}
