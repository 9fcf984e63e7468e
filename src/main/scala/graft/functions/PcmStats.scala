package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Waveform statistics of a binary audio payload interpreted as
  * 8-bit unsigned PCM samples — the audio face of the multimodal
  * family (MediaOps m06). Returns `[n_samples, silence_ct, clip_ct,
  * peak, energy]` as one per-row array of BIGINTs:
  *
  *  - silence_ct: samples within ±16 of the 128 midpoint (the VAD
  *    stand-in every audio-curation pipeline gates on);
  *  - clip_ct: samples at the 0/255 rails (clipping damage);
  *  - peak: max |sample − 128| (0 for an empty payload);
  *  - energy: Σ (sample − 128)² — exact integer, so the DuckDB
  *    oracle replays it without float-order concerns (≤ 2^14 per
  *    sample; overflow needs 2^49 samples in one payload).
  *
  * The byte→sample interpretation is the honest STUB for a real
  * audio decoder (no codecs in this container — MediaOps.decodeStub
  * contract): swap it for PCM frames out of a decoder and the
  * statistics, schema and plumbing stay. One codegen'd pass per
  * row, no shuffle; the staged hex/list form this replaces walks an
  * interpreted tree per byte. */
case class PcmStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_pcm_stats expects binary, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    PcmStats.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PcmStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): PcmStats =
    copy(child = newChild)

  override def prettyName: String = "graft_pcm_stats"
}

object PcmStats {
  val SILENCE_BAND = 16 // |sample - 128| below this counts as silence

  def stats(media: Array[Byte]): ArrayData = {
    var silence = 0L
    var clip = 0L
    var peak = 0L
    var energy = 0L
    var i = 0
    while (i < media.length) {
      val v = media(i) & 0xFF
      val dev = math.abs(v - 128)
      if (dev < SILENCE_BAND) silence += 1L
      if (v == 0 || v == 255) clip += 1L
      if (dev > peak) peak = dev.toLong
      energy += dev.toLong * dev
      i += 1
    }
    new GenericArrayData(Array(media.length.toLong, silence, clip, peak, energy))
  }
}
