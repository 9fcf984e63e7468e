package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable 60-bit string hash as a native expression:
  * value ≡ `conv(substring(md5(x),1,15),16,10)` — the first 15 hex
  * digits of the MD5 = the first 8 digest bytes big-endian shifted
  * right by the low nibble — but computed straight from the digest
  * bytes, skipping the hex-string materialization and the base-16
  * string parse (two allocations per row in the md5/conv form, which
  * dominate MinHash/SimHash/fingerprint scans). The MessageDigest is
  * thread-local, not per-call.
  *
  * DuckDB twin unchanged: `CAST('0x' || substr(md5(x),1,15) AS
  * BIGINT)` (graft.functions.Portable.h60Sql) — bit-identical.
  */
case class H60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_h60 expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    H60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)

  override def prettyName: String = "graft_h60"
}

object H60 {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s): 8 digest bytes big-endian >>> 4. */
  def hash(s: UTF8String): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length)
  }

  /** Same, over a byte slice — lets window-hashing callers
    * ([[Winnow60]]) avoid a per-window substring allocation. */
  def hashBytes(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val m = md.get()
    m.reset()
    m.update(bytes, offset, len)
    val d = m.digest()
    val hi =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    hi >>> 4
  }

  /** Non-unsafe entry for tests. */
  def hashString(s: String): Long = hash(UTF8String.fromString(s))
}
