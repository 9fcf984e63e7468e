package graft.streaming

import graft.operators.ScaleOps
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.types._

/** STREAMING SOURCE over the snapshot store — `readStream
  * .format("graft-snapshot")`, the Delta-streaming-source shape: the
  * stream TAILS committed versions, emitting each append's file
  * delta and each rewrite's committed change feed as
  * `_change_type`/`_commit_version`-tagged rows, resuming exactly
  * from a checkpointed VERSION offset (versions are immutable, so
  * replayed batches are bit-identical — at-least-once upstream
  * becomes exactly-once with any idempotent sink). This closes the
  * loop with [[Jobs]]' snapshot ingest: streams have written the
  * store since s14; now streams can READ it.
  *
  * Built on the v1 `Source` contract deliberately (the same choice
  * Delta's DeltaSource makes): `getBatch` returns a PLANNED
  * DataFrame, so each micro-batch reuses the engine's entire batch
  * read path — manifest-header schema resolution, file-grain delta
  * planning, Spark's vectorized parquet scan — instead of a bespoke
  * partition reader. The only internal surface that requires is the
  * streaming flag ([[SqlShims.asStreamingFrame]]).
  *
  * Offsets are version numbers. Batch (after, end]:
  *  - fresh start, no `startingVersion`: the latest version's FULL
  *    content as inserts (Delta's initial-snapshot default), then
  *    deltas forever after;
  *  - `startingVersion` = v: change-feed hops from v onward (v's own
  *    commit included; v=1 replays the whole history);
  *  - per hop: pure append → added files; rewrite → its committed
  *    feed; a feed-less rewrite or a vacuumed-away parent THROWS —
  *    a stream that silently replayed a full corpus as "changes"
  *    would duplicate everything downstream.
  *
  * The stream's schema is pinned at start (latest version's manifest
  * header + the two metadata columns); rows from later evolved
  * versions project onto it — new columns appear on restart, the
  * Delta rule. */
class SnapshotStream(spark: SparkSession, root: String,
    startingVersion: Option[Long], dataSchema: StructType) extends Source {

  override val schema: StructType = SnapshotStream.withMeta(dataSchema)

  override def getOffset: Option[OffsetV1] =
    ScaleOps.snapshotVersions(spark, root).lastOption.map(LongOffset(_))

  private def ver(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.replaceAll("\"", "").toLong
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = ver(end)
    val batch = start.map(ver) match {
      case Some(afterV) if afterV >= endV =>
        // replanned empty range (no new commits): zero rows, schema kept
        ScaleOps.readSnapshot(spark, root, Some(endV)).limit(0)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(0L))
      case Some(afterV) => ScaleOps.changeFeedHops(spark, root, afterV, endV)
      case None => startingVersion match {
        case Some(sv) => ScaleOps.changeFeedHops(spark, root, sv - 1, endV)
        case None => // initial snapshot: current content, then deltas
          ScaleOps.readSnapshot(spark, root, Some(endV))
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(endV))
      }
    }
    // project onto the pinned stream schema: columns a hop's files
    // physically lack are null-filled, columns the stream predates
    // are dropped (they appear on restart — the Delta rule)
    val projected = batch.select(schema.fields.map { f =>
      if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    SqlShims.asStreamingFrame(projected)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"SnapshotStream[$root${startingVersion.fold("")(v => s", from v$v")}]"
}

object SnapshotStream {

  private[graft] def withMeta(st: StructType): StructType =
    StructType(st.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))

  /** Resolve (root, pinned data schema) for a stream's options —
    * metadata-only, one manifest header read (the batch connector's
    * discipline). Streams tail the HEAD, so the batch pins
    * (version/ref/timestampAsOf) are rejected loudly. */
  private[graft] def resolveStream(
      parameters: Map[String, String]): (String, Option[Long], StructType) = {
    val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = opts.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot stream requires a path option (the store root)"))
    Seq("version", "ref", "timestampasof").foreach(k =>
      require(!opts.contains(k),
        s"graft-snapshot streams tail the head; '$k' cannot pin one " +
          "(use startingVersion to replay history)"))
    val startingVersion = opts.get("startingversion").map(_.toLong)
    startingVersion.foreach(v =>
      require(v >= 1, s"startingVersion must be >= 1, got $v"))
    val s = SparkSession.active
    val vs = ScaleOps.snapshotVersions(s, root)
    require(vs.nonEmpty, s"no committed snapshots under $root")
    val dataSchema = ScaleOps.snapshotSchema(s, root, vs.last).getOrElse(
      ScaleOps.readSnapshot(s, root, Some(vs.last)).schema)
    (root, startingVersion, dataSchema)
  }
}
