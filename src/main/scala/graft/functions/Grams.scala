package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_grams(tokens, n)` — `array<string>` of every n-token
  * shingle of `tokens` as TEXT, element i ≡
  * `concat_ws(' ', slice(tokens, i + 1, n))` — bit-identical to the
  * HOF formulation the vocabulary queries used
  * (`transform(sequence(0, size - n), i -> …)`), so the DuckDB
  * oracle twins (`array_to_string(toks[i+1:i+n], ' ')`) are
  * unchanged. [[GramH60]]'s byte-walk minus the hash: where gram
  * IDENTITY must stay human-readable (t13/t13x's frequency tables),
  * the kernel emits the string instead of its H60.
  *
  * Why an Expression: the HOF form pays, PER GRAM, an interpreted
  * two-level lambda dispatch, a `slice` ArrayData allocation, and
  * `concat_ws`'s generic join — t13's bigram build runs it over
  * every token of the corpus. This kernel grabs each token's bytes
  * once and assembles each gram in one reusable buffer; the only
  * per-gram allocation is the output string itself.
  *
  * Contract: `n` must be a positive foldable int; fewer than n
  * tokens → empty array; null token elements are skipped exactly
  * like `concat_ws` skips array nulls (no doubled separator); null
  * `tokens` → null. */
case class Grams(tokens: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = n

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, n.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if n.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        "graft_grams expects (array<string>, int literal), got " +
          Seq(t, w).map(_.catalogString).mkString(", "))
    }

  override protected def nullSafeEval(t: Any, w: Any): Any =
    Grams.grams(t.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.Grams.grams($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Grams =
    copy(tokens = newLeft, n = newRight)

  override def prettyName: String = "graft_grams"
}

object Grams {

  /** The n-gram strings of `toks`, positional (element i = gram
    * starting at token i). */
  def grams(toks: ArrayData, n: Int): ArrayData = {
    require(n > 0, s"graft_grams: gram width n=$n must be positive")
    val nTok = toks.numElements()
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](nTok)
    var i = 0
    while (i < nTok) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](nTok - n + 1)
    var buf = new Array[Byte](64)
    var g = 0
    while (g <= nTok - n) {
      var len = 0
      var first = true
      var j = g
      while (j < g + n) {
        val t = tb(j)
        if (t != null) { // concat_ws skips null elements
          val need = len + t.length + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(len) = ' '.toByte; len += 1 }
          System.arraycopy(t, 0, buf, len, t.length)
          len += t.length
          first = false
        }
        j += 1
      }
      out(g) = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
      g += 1
    }
    new GenericArrayData(out)
  }
}
