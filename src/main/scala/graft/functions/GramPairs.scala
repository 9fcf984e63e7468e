package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_gram_pairs(tokens)` — `array<struct<w1:string, w2:string>>`
  * of every ADJACENT token pair, element i ≡
  * `struct(tokens[i] AS w1, tokens[i+1] AS w2)` — bit-identical to
  * the HOF formulation the bigram-model queries used
  * (`transform(sequence(0, size - 2), i -> struct(…))`), so the
  * DuckDB oracle twins (shifted-unnest zips) are unchanged. The
  * pair-STRUCT sibling of [[Grams]]: where downstream keys on the
  * two words separately (t15/t22's bigram LM joins on (w1, w2) and
  * on w1 alone; t31's Kneser-Ney continuation counts key on each
  * side), emitting the struct beats emitting "w1 w2" text that would
  * immediately be re-split.
  *
  * Why an Expression: the HOF form pays an interpreted two-level
  * lambda dispatch and a struct allocation PER TOKEN of the corpus —
  * twice per LM build (reference + target pass). This kernel reads
  * each token's UTF8String once and emits the rows directly; null
  * elements pass through as null fields (exactly the HOF's struct
  * semantics — no concat_ws-style skipping here).
  *
  * Contract: fewer than 2 tokens → empty array; null `tokens` →
  * null. */
case class GramPairs(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    tokens.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_pairs expects array<string>, got ${t.catalogString}")
    }

  override protected def nullSafeEval(t: Any): Any =
    GramPairs.pairs(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.GramPairs.pairs($t)")

  override protected def withNewChildInternal(newChild: Expression): GramPairs =
    copy(tokens = newChild)

  override def prettyName: String = "graft_gram_pairs"
}

object GramPairs {

  /** Adjacent (w1, w2) pair rows of `toks`, positional. */
  def pairs(toks: ArrayData): ArrayData = {
    val nTok = toks.numElements()
    if (nTok < 2) return new GenericArrayData(Array.empty[Any])
    // fetch each token once; pair i reuses pair i-1's second element
    val out = new Array[Any](nTok - 1)
    var prev = if (toks.isNullAt(0)) null else toks.getUTF8String(0)
    var i = 1
    while (i < nTok) {
      val cur = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      out(i - 1) = new GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}
