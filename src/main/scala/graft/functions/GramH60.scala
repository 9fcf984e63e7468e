package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_gram_h60(tokens, n)` — `array<long>` of the [[H60]] hashes
  * of every n-token shingle of `tokens`, element i ≡
  * `graft_h60(concat_ws(' ', slice(tokens, i + 1, n)))` —
  * bit-identical to the HOF formulation every shingle-family query
  * used (`transform(sequence(0, size - n), i -> …)`), so the DuckDB
  * oracle twins (md5-prefix over `array_to_string(toks[i+1:i+n])`)
  * are unchanged.
  *
  * Why an Expression: the HOF form pays, PER GRAM, an interpreted
  * two-level lambda dispatch, a `slice` ArrayData allocation, and
  * `concat_ws`'s generic join — on the widest scans in the engine
  * (every dedup/decontamination/novelty query shingles the corpus;
  * a T-token document emits T−n+1 grams). This kernel grabs each
  * token's bytes once, assembles each gram into one reusable byte
  * buffer, and hashes via [[H60.hashBytes]] — zero per-gram
  * allocations beyond the md5 digest. The md5-per-gram is inherent
  * (the gram IDENTITY is the md5 prefix, shared with the oracle);
  * everything around it is not.
  *
  * Contract: `n` must be a positive foldable int; fewer than n
  * tokens → empty array; null token elements are skipped exactly
  * like `concat_ws` skips array nulls (no doubled separator); null
  * `tokens` → null. */
case class GramH60(tokens: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = n

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, n.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if n.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        "graft_gram_h60 expects (array<string>, int literal), got " +
          Seq(t, w).map(_.catalogString).mkString(", "))
    }

  override protected def nullSafeEval(t: Any, w: Any): Any =
    GramH60.grams(t.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.GramH60.grams($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramH60 =
    copy(tokens = newLeft, n = newRight)

  override def prettyName: String = "graft_gram_h60"
}

object GramH60 {

  /** H60 of each n-gram of `toks`, positional (element i = gram
    * starting at token i). */
  def grams(toks: ArrayData, n: Int): ArrayData = {
    require(n > 0, s"graft_gram_h60: gram width n=$n must be positive")
    val nTok = toks.numElements()
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    // Token bytes fetched once; grams re-read them n times each but
    // never re-decode the ArrayData.
    val tb = new Array[Array[Byte]](nTok)
    var i = 0
    while (i < nTok) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](nTok - n + 1)
    // One buffer reused across grams, grown to the widest gram seen.
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
      out(g) = H60.hashBytes(buf, 0, len)
      g += 1
    }
    new GenericArrayData(out)
  }
}
