package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_count_rlike(arr, regex)` — how many elements of the string
  * array `arr` (with multiplicity, nulls skipped) contain a match of
  * the literal Java regex `regex` (RLIKE find() semantics, not full
  * match). Bit-identical to the HOF formulation
  * `size(filter(arr, x -> x.rlike(regex)))` the t19 rule gates used
  * (null `arr` → null; null ELEMENTS yield null from rlike and are
  * dropped by filter — here simply skipped), so the DuckDB oracle
  * twins (`len(list_filter(..., regexp_matches(...)))`) are
  * unchanged; CountRlikeSpec pins the parity.
  *
  * Why an Expression: like [[CountIn]], the HOF filter does not
  * participate in whole-stage codegen — t19's rule projection paid
  * THREE interpreted per-element lambda dispatches per document
  * (alpha-word, bullet-line, ellipsis-line counts), each
  * re-evaluating a regex on the hot corpus scan. This kernel is one
  * fused loop over the array with a pattern compiled ONCE per
  * (executor, expression) via a lazy transient. */
case class CountRlike(arr: Expression, regex: Expression)
    extends BinaryExpression {

  override def left: Expression = arr
  override def right: Expression = regex

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (arr.dataType, regex.dataType) match {
      case (ArrayType(StringType, _), StringType) if regex.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, r) => TypeCheckResult.TypeCheckFailure(
        "graft_count_rlike expects (array<string>, string literal), got " +
          Seq(a, r).map(_.catalogString).mkString(", "))
    }

  override protected def nullSafeEval(a: Any, r: Any): Any =
    CountRlike.count(a.asInstanceOf[ArrayData], r.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, r) =>
      s"graft.functions.CountRlike.count($a, $r.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountRlike =
    copy(arr = newLeft, regex = newRight)

  override def prettyName: String = "graft_count_rlike"
}

object CountRlike {

  /** Per-executor compiled-pattern cache — `regex` is foldable, so
    * the map holds one entry per distinct literal (t19 has 3). */
  private val patterns =
    new java.util.concurrent.ConcurrentHashMap[String, Pattern]()

  private def pattern(re: String): Pattern = {
    val p = patterns.get(re)
    if (p != null) p
    else patterns.computeIfAbsent(re, Pattern.compile(_))
  }

  /** Count of non-null elements containing a match (RLIKE/find()
    * semantics — the same java.util.regex path Spark's RLike runs). */
  def count(arr: ArrayData, re: String): Long = {
    val p = pattern(re)
    val n = arr.numElements()
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
        p.matcher(arr.getUTF8String(i).toString).find()) cnt += 1L
      i += 1
    }
    cnt
  }
}
