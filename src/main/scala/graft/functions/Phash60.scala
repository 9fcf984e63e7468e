package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 60-bit perceptual fingerprint of a binary media payload, as ONE
  * per-row expression (MediaOps m04's hot path).
  *
  * Semantics are exactly the staged relational form it replaces
  * (hex → 61 equal slices → h60 "cell intensity" per slice →
  * adjacent-comparison bits, MSB-first fold), which the DuckDB
  * oracle keeps — results are bit-identical because the hex alphabet
  * (uppercase, Spark's and DuckDB's `hex`), the floor(len/61) slice
  * width, the end-clipped substring and the [[H60]] cell hash all
  * mirror the SQL. The cell intensities are the honest STUB for a
  * decoder's grid of mean pixel intensities (this container has no
  * codecs — see MediaOps.decodeStub); the dHash bit structure and
  * everything downstream are real.
  *
  * Why an expression: higher-order Column functions are interpreted
  * (no codegen, no subexpression elimination), so the staged form
  * paid 61 interpreted substr+md5 tree walks per row — measured
  * 5.6 s at sf0.1 vs ~1 s for this single codegen'd call that hexes
  * once and hashes byte slices with zero per-cell allocations. */
case class Phash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_phash60 expects binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Phash60.fingerprint(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Phash60.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Phash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_phash60"
}

object Phash60 {
  private val BITS = 60
  private val CELLS = BITS + 1
  private val HEX = "0123456789ABCDEF".getBytes

  def fingerprint(media: Array[Byte]): Long = {
    val hex = new Array[Byte](media.length * 2)
    var i = 0
    while (i < media.length) {
      val v = media(i) & 0xFF
      hex(i * 2) = HEX(v >>> 4)
      hex(i * 2 + 1) = HEX(v & 0xF)
      i += 1
    }
    val len = hex.length
    val w = math.max(1, len / CELLS) // floor, = SQL floor(len/61.0)
    val cells = new Array[Long](CELLS)
    var k = 0
    while (k < CELLS) {
      val start = k * w
      // substr clipping: beyond-end → empty, partial → truncated
      val l = if (start >= len) 0 else math.min(w, len - start)
      cells(k) = H60.hashBytes(hex, if (start >= len) 0 else start, l)
      k += 1
    }
    var fp = 0L
    var b = 0
    while (b < BITS) {
      if (cells(b) < cells(b + 1)) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** Test entry. */
  def fingerprintOf(bytes: Array[Byte]): Long = fingerprint(bytes)
}
