package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_filter_in(tokens, words)` — the elements of `tokens` (order
  * and multiplicity preserved, null elements dropped) that are members
  * of the literal string array `words`. Bit-identical to the HOF
  * formulation `filter(tokens, t -> t.isInCollection(words))` the BM25
  * postings restriction used (null `tokens` → null; a null ELEMENT
  * makes the IN predicate null and is dropped by filter — here simply
  * skipped), so the DuckDB oracle twins (`list_filter(t, x -> x IN
  * (...))`) are unchanged; FilterInSpec pins the parity.
  *
  * Why an Expression: the [[CountIn]] rationale — the HOF filter does
  * not participate in whole-stage codegen, so c24/c28's one corpus
  * pass paid an interpreted per-token lambda dispatch (plus an In
  * evaluation) on every token of every document just to keep the few
  * query-term matches. This kernel is one fused byte-compare loop in
  * the scan's codegen stage; `words` stays a handful of query terms,
  * so the linear membership scan beats per-batch set construction. */
case class FilterIn(tokens: Expression, words: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = words

  // Kept elements are by construction non-null.
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, words.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if words.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        "graft_filter_in expects (array<string>, array<string> literal), got " +
          Seq(t, w).map(_.catalogString).mkString(", "))
    }

  override protected def nullSafeEval(t: Any, w: Any): Any =
    FilterIn.keep(t.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.FilterIn.keep($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FilterIn =
    copy(tokens = newLeft, words = newRight)

  override def prettyName: String = "graft_filter_in"
}

object FilterIn {

  /** The kept elements: non-null members of `words`, input order and
    * multiplicity preserved — null WORD elements are skipped (cannot
    * equal a non-null token), the [[CountIn.count]] convention. */
  def keep(toks: ArrayData, words: ArrayData): ArrayData = {
    val nw = words.numElements()
    val wb = new Array[org.apache.spark.unsafe.types.UTF8String](nw)
    var i = 0
    var nwNonNull = 0
    while (i < nw) {
      if (!words.isNullAt(i)) { wb(nwNonNull) = words.getUTF8String(i); nwNonNull += 1 }
      i += 1
    }
    val n = toks.numElements()
    val out = new java.util.ArrayList[AnyRef](4)
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
        if (found) out.add(t)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
