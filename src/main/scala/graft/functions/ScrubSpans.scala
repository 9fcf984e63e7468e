package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_scrub_spans(tokens, starts, n)` — the tokens of `tokens`
  * whose position is covered by NO span `[st, st + n)` for `st` in
  * `starts` — the span-excision kernel of the Lee-et-al duplicated-
  * span scrub (DedupOps c46/c47).
  *
  * Why an Expression: the higher-order-function form
  * (`filter(sequence(0, n-1), p -> NOT exists(starts, st -> st <= p
  * AND p < st + n))` followed by a `transform(…, element_at…)`
  * rejoin) evaluates an interpreted lambda with a nested `exists`
  * scan PER TOKEN — worst-case O(n_toks × n_starts) per document, on
  * the corpus-wide destructive-rewrite path. This kernel sorts the
  * starts once (O(s log s)) and walks tokens and spans together with
  * a two-pointer cover (O(n_toks + n_starts)), emitting kept tokens
  * in one fused loop — the same interpreted-HOF escape that took t38
  * from 5.7 s to 0.85 s warm ([[CollapseRuns]], BASELINE.md).
  *
  * Contract: positions are 0-based; `starts` need not be sorted or
  * distinct (collect_list order is arbitrary); overlapping spans
  * merge naturally (a position is dropped if ANY span covers it);
  * null elements in `starts` are ignored; null elements in `tokens`
  * pass through as kept nulls when uncovered. Null in any argument →
  * null result (null-safe), matching the HOF formulation over a null
  * token array. */
case class ScrubSpans(tokens: Expression, starts: Expression, n: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = starts
  override def third: Expression = n

  override def dataType: DataType = tokens.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, starts.dataType, n.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _), IntegerType)
          if n.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, s, w) => TypeCheckResult.TypeCheckFailure(
        "graft_scrub_spans expects (array<string>, array<int>, int literal), got " +
          Seq(t, s, w).map(_.catalogString).mkString(", "))
    }

  override protected def nullSafeEval(t: Any, s: Any, w: Any): Any =
    ScrubSpans.scrub(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData],
      w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, w) =>
      s"graft.functions.ScrubSpans.scrub($t, $s, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ScrubSpans =
    copy(tokens = newFirst, starts = newSecond, n = newThird)

  override def prettyName: String = "graft_scrub_spans"
}

object ScrubSpans {

  /** Kept tokens after excising every `[st, st + n)` cover. */
  def scrub(toks: ArrayData, startsArr: ArrayData, n: Int): ArrayData = {
    require(n > 0, s"graft_scrub_spans: span width n=$n must be positive")
    val nTok = toks.numElements()
    val nSt = startsArr.numElements()
    // Compact non-null starts, then sort ascending so the cover walk
    // can merge spans with a single forward pointer.
    val st = new Array[Int](nSt)
    var m = 0
    var i = 0
    while (i < nSt) {
      if (!startsArr.isNullAt(i)) { st(m) = startsArr.getInt(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(st, 0, m)
    val tmp = new Array[Any](nTok)
    var k = 0
    var j = 0
    var coverEnd = Int.MinValue // exclusive end of the merged cover so far
    var p = 0
    while (p < nTok) {
      while (j < m && st(j) <= p) {
        val e = st(j) + n
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (p >= coverEnd) {
        tmp(k) = if (toks.isNullAt(p)) null else toks.getUTF8String(p)
        k += 1
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      tmp.asInstanceOf[Array[AnyRef]], k))
  }
}
