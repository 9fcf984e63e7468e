package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_count_in(tokens, words)` — how many elements of `tokens`
  * (with multiplicity, nulls skipped) are members of the literal
  * string array `words`. Bit-identical to the HOF formulation
  * `size(filter(tokens, t -> array_contains(words, t)))` the quality/
  * language scorers used (null `tokens` → null, like size(null) under
  * the default non-legacy conf), so the DuckDB oracle twins
  * (`len(list_filter(...))`) are unchanged.
  *
  * Why an Expression: higher-order functions don't participate in
  * whole-stage codegen — the filter paid an interpreted per-TOKEN
  * lambda dispatch plus an array_contains scan, and it sits on the
  * hot path of every quality-scored corpus pass (t01/t02/t12/t19/t21/
  * t23/t25, c08/c17/c32, the card/mix family). This kernel is one
  * fused byte-compare loop in the scan's codegen stage. `words` stays
  * a handful of stopwords, so a linear membership scan (length check
  * first, then bytes) beats set construction per batch. */
case class CountIn(tokens: Expression, words: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = words

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, words.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if words.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        "graft_count_in expects (array<string>, array<string> literal), got " +
          Seq(t, w).map(_.catalogString).mkString(", "))
    }

  override protected def nullSafeEval(t: Any, w: Any): Any =
    CountIn.count(t.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.CountIn.count($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIn =
    copy(tokens = newLeft, words = newRight)

  override def prettyName: String = "graft_count_in"
}

object CountIn {

  /** Occurrence count of `toks` elements present in `words` — null
    * token elements never match (array_contains yields null there, so
    * the HOF filter dropped them too); null WORD elements are skipped
    * (cannot equal a non-null token). */
  def count(toks: ArrayData, words: ArrayData): Long = {
    val nw = words.numElements()
    val wb = new Array[org.apache.spark.unsafe.types.UTF8String](nw)
    var i = 0
    var nwNonNull = 0
    while (i < nw) {
      if (!words.isNullAt(i)) { wb(nwNonNull) = words.getUTF8String(i); nwNonNull += 1 }
      i += 1
    }
    val n = toks.numElements()
    var cnt = 0L
    i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        var found = false
        while (j < nwNonNull && !found) {
          if (wb(j).equals(t)) found = true
          j += 1
        }
        if (found) cnt += 1L
      }
      i += 1
    }
    cnt
  }
}
