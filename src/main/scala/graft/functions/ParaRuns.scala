package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_para_runs(tokens, p)` — `array<string>` of the p-token
  * NON-OVERLAPPING runs of `tokens` (trailing partial run included),
  * element i ≡ `concat_ws(' ', slice(tokens, i*p + 1, p))` — the
  * paragraph grain of the c15/c17 boilerplate family
  * (DedupOps.paragraphRuns), bit-identical to the HOF formulation so
  * the DuckDB oracle twins are unchanged.
  *
  * Why an Expression: the HOF form pays, PER RUN, an interpreted
  * lambda dispatch, a `slice` ArrayData allocation, and `concat_ws`'s
  * generic join — on corpus-rewrite paths that touch every token of
  * every document (same tax class [[GramH60]] killed for overlapping
  * shingles; this is its non-overlapping twin). The kernel walks the
  * token array once and emits each run from one reusable byte buffer
  * — the only per-run allocation is the output string itself.
  *
  * Contract: `p` must be a positive foldable int; an EMPTY token
  * array → empty array (never the phantom runs
  * `sequence(0, ceil(0/p)-1)` would fabricate); null token elements
  * are skipped exactly like `concat_ws` skips array nulls; null
  * `tokens` → null. */
case class ParaRuns(tokens: Expression, p: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = p

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, p.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if p.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        "graft_para_runs expects (array<string>, int literal), got " +
          Seq(t, w).map(_.catalogString).mkString(", "))
    }

  override protected def nullSafeEval(t: Any, w: Any): Any =
    ParaRuns.runs(t.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.ParaRuns.runs($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ParaRuns =
    copy(tokens = newLeft, p = newRight)

  override def prettyName: String = "graft_para_runs"
}

object ParaRuns {

  /** The p-token non-overlapping runs of `toks`, trailing partial run
    * included. */
  def runs(toks: ArrayData, p: Int): ArrayData = {
    require(p > 0, s"graft_para_runs: run width p=$p must be positive")
    val nTok = toks.numElements()
    if (nTok == 0) return new GenericArrayData(Array.empty[Any])
    val nRuns = (nTok + p - 1) / p
    val out = new Array[Any](nRuns)
    // one buffer reused across runs, grown to the widest run seen
    var buf = new Array[Byte](64)
    var r = 0
    while (r < nRuns) {
      var len = 0
      var first = true
      var j = r * p
      val end = math.min(j + p, nTok)
      while (j < end) {
        if (!toks.isNullAt(j)) { // concat_ws skips null elements
          val t = toks.getUTF8String(j)
          val tLen = t.numBytes()
          val need = len + tLen + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(len) = ' '.toByte; len += 1 }
          t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
          len += tLen
          first = false
        }
        j += 1
      }
      out(r) = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
      r += 1
    }
    new GenericArrayData(out)
  }
}
