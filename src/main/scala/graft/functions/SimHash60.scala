package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit term-frequency-weighted SimHash of a whitespace-tokenized
  * text column, as ONE per-row expression.
  *
  * Semantics are exactly the relational pipeline it replaces
  * (explode(split(text,'\s+')) → groupBy(doc,tok) count → per-bit
  * SUM(freq*(2*bit(h60(tok))-1)) → sign → pack), and the DuckDB
  * oracle keeps that relational form — results are bit-identical
  * because tokenization mirrors Spark's `split` (Pattern.split with
  * limit -1, trailing empty strings kept) and the per-token hash is
  * the same [[H60]].
  *
  * Why an expression: SimHash is a per-document function. The
  * relational form shuffles the full (doc, token) table and builds a
  * 60-column-wide hash-aggregate row — the slowest query of round 2
  * (23.3 s at sf0.1, BENCH_r02). This computes the fingerprint in one
  * narrow codegen'd pass: no explode, no shuffle, O(tokens) per row.
  * At 100 TB the fingerprint stage becomes embarrassingly parallel.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash60 expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash60"
}

object SimHash60 {
  private val BITS = 60
  private val WS = Pattern.compile("\\s+")

  /** The weighted fingerprint. Tokenization must stay identical to
    * Spark's `split(text, '\s+')`: Pattern.split with limit -1 keeps
    * trailing empty strings (Java's default String.split drops them),
    * so an all-whitespace suffix contributes the same empty token the
    * relational pipeline counted. */
  def fingerprint(text: UTF8String): Long = {
    val toks = WS.split(text.toString, -1)
    val freq = new java.util.HashMap[String, Integer](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      freq.merge(toks(i), Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      i += 1
    }
    val acc = new Array[Long](BITS)
    val it = freq.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = H60.hashString(e.getKey)
      val f = e.getValue.longValue()
      var j = 0
      while (j < BITS) {
        acc(j) += (if (((h >> j) & 1L) == 1L) f else -f)
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < BITS) {
      if (acc(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** String entry for tests. */
  def fingerprintString(s: String): Long = fingerprint(UTF8String.fromString(s))
}
