package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 1-sample winnowing fingerprint: the minimum [[H60]] over all
  * 8-character sliding windows of the text (min over i of
  * h60(substring(text, i, 8)), i = 1 … max(len-7, 1)).
  *
  * Equivalent to the HOF form
  * `array_min(transform(sequence(1, greatest(length(text)-7, 1)),
  * i -> graft_h60(substring(text, i, 8))))` — which the DuckDB oracle
  * keeps (TextOps t04) — but computed in one pass over the UTF-8
  * bytes: character start offsets are walked once, each window is
  * hashed straight from the byte slice (no per-window substring
  * allocation, no interpreted lambda, no O(len) re-scan per window
  * that substring-from-position implies). Windows are counted in
  * CODE POINTS, exactly like Spark's `substring` and DuckDB's
  * `substr`, so multi-byte text (zh docs) agrees across all three.
  */
case class Winnow60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_winnow60 expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Winnow60.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow60.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Winnow60 =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow60"
}

object Winnow60 {
  private val WINDOW = 8

  def fingerprint(text: UTF8String): Long = {
    val bytes = text.getBytes
    // Character (code point) start offsets; offs(nChars) = total bytes.
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var pos = 0
    while (pos < bytes.length) {
      offs(nChars) = pos
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      nChars += 1
    }
    offs(nChars) = bytes.length
    val nWin = math.max(nChars - (WINDOW - 1), 1)
    var min = Long.MaxValue
    var i = 0
    while (i < nWin) {
      val start = offs(i)
      val end = if (i + WINDOW <= nChars) offs(i + WINDOW) else bytes.length
      val h = H60.hashBytes(bytes, start, end - start)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** String entry for tests. */
  def fingerprintString(s: String): Long = fingerprint(UTF8String.fromString(s))
}
