package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_winhash60(text, w, stride)` — the 60-bit [[H60]] hashes of
  * the `w`-character sliding windows of `text`, taken every `stride`
  * characters (window starts 1, 1+s, 1+2s, … ≤ len−w+1; EMPTY array
  * when the text is shorter than `w`).
  *
  * [[Winnow60]]'s byte-walk generalized from "min over all windows"
  * to "array of strided windows": character (code point) start
  * offsets are computed once, each window hashed straight from the
  * byte slice — no per-window substring allocation, no interpreted
  * md5 lambda. Windows are counted in CODE POINTS, exactly like
  * Spark's `substring` and DuckDB's `substr`, so the DuckDB twin
  * `list_transform(range(1, len-w+2, stride), i -> h60(substr(text,
  * i, w)))` is bit-identical.
  *
  * This is the primitive behind exact-substring decontamination
  * (DedupOps c16): the eval side hashes EVERY window (stride 1), the
  * corpus side only every s-th — any shared substring of length
  * ≥ w+s−1 must fully contain one corpus-strided window, and that
  * exact window is in the eval set, so detection at that length has
  * NO false negatives while the corpus-side work drops by s×.
  */
case class WinHash60(text: Expression, w: Expression, stride: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = w
  override def third: Expression = stride

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && w.dataType == IntegerType &&
      stride.dataType == IntegerType && w.foldable && stride.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_winhash60 expects (string, int literal, int literal), got " +
        Seq(text, w, stride).map(_.dataType.catalogString).mkString(", "))

  override protected def nullSafeEval(t: Any, wv: Any, sv: Any): Any =
    WinHash60.hashes(t.asInstanceOf[UTF8String],
      wv.asInstanceOf[Int], sv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, wv, sv) =>
      s"graft.functions.WinHash60.hashes($t, $wv, $sv)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinHash60 =
    copy(text = newFirst, w = newSecond, stride = newThird)

  override def prettyName: String = "graft_winhash60"
}

object WinHash60 {

  /** Strided w-code-point window hashes; empty for len < w. */
  def hashes(text: UTF8String, w: Int, stride: Int): ArrayData = {
    require(w > 0 && stride > 0, s"graft_winhash60: w=$w stride=$stride must be positive")
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
    if (nChars < w) return new GenericArrayData(Array.empty[Any])
    val nWin = (nChars - w) / stride + 1
    val out = new Array[Any](nWin)
    var k = 0
    while (k < nWin) {
      val start = offs(k * stride)
      val end = offs(k * stride + w)
      out(k) = H60.hashBytes(bytes, start, end - start)
      k += 1
    }
    new GenericArrayData(out)
  }
}
