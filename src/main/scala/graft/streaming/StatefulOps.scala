package graft.streaming

import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{Dataset, SparkSession}

/** The three genuinely stateful streaming operators of the reference,
  * built on flatMapGroupsWithState (SURVEY.md §2 A9/A10/A16).
  *
  * Each works identically on a bounded Dataset (batch execution of
  * flatMapGroupsWithState) and on a streaming Dataset — the specs
  * assert parity against the declarative batch twins in
  * graft.operators (DwdOps.a09/a10, DwsWindows.a16Bounce).
  *
  * Scale notes: state is partitioned by the group key across the
  * cluster's state store; per-key state is O(1) (a date string or one
  * pending event), so 10^9 users ⇒ ~tens of GB state cluster-wide,
  * evicted by event-time/processing-time timeouts. No driver-side
  * state, no collect.
  */
object StatefulOps {

  private val dayFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)
  private def day(ts: Timestamp): String =
    dayFmt.format(Instant.ofEpochMilli(ts.getTime))

  /** A9 — new/old visitor repair (BaseLogApp.java:56-90): a claimed
    * is_new=1 is kept only on the user's first-seen date; the state
    * stores that date forever (the reference keeps this ValueState
    * unexpired too). Events inside a micro-batch are ordered by
    * (ts, event_id) before applying state, so intra-batch ordering
    * matches the reference's per-record arrival order. */
  def repairIsNew(spark: SparkSession, events: Dataset[EventRow]): Dataset[RepairedVisit] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[EventRow], state: GroupState[FirstVisitState]) => {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var first = state.getOption.map(_.firstDate)
          val out = sorted.map { e =>
            val dt = day(e.ts)
            if (first.isEmpty) first = Some(dt)
            RepairedVisit(e.event_id, userId, dt,
              if (first.contains(dt)) "1" else "0")
          }
          first.foreach(f => state.update(FirstVisitState(f)))
          out.iterator
        })
  }

  /** A10 — daily-unique-visit filter (UniqueVisitApp.java:67-106):
    * emit only the first qualifying view per user per day. State is
    * the last emitted date; a processing-time timeout (the reference's
    * 1-day StateTtlConfig) evicts idle keys so state stays bounded.
    *
    * `ttl=None` runs without the eviction timeout. Note for callers:
    * with a processing-time timeout, Spark's micro-batch engine always
    * schedules another batch (shouldRunAnotherBatch is never false),
    * so `processAllAvailable` on such a query may block forever —
    * synchronize on the sink instead (see StatefulOpsSpec). */
  def dailyFirstVisit(spark: SparkSession, events: Dataset[EventRow],
      ttl: Option[String] = Some("1 day")): Dataset[UniqueVisit] = {
    import spark.implicits._
    val streaming = events.isStreaming // plain val: the closure must not capture the Dataset
    val useTtl = streaming && ttl.isDefined
    val timeoutConf =
      if (useTtl) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val ttlDuration = ttl.getOrElse("")
    events
      .filter(_.event_type == "view")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (userId: Long, it: Iterator[EventRow], state: GroupState[LastVisitState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var last = state.getOption.map(_.lastDate)
            val out = sorted.flatMap { e =>
              val dt = day(e.ts)
              if (last.contains(dt)) None
              else { last = Some(dt); Some(UniqueVisit(e.event_id, userId, dt)) }
            }
            last.foreach(l => state.update(LastVisitState(l)))
            // 1-day TTL, OnCreateAndWrite — mirrors UniqueVisitApp.java:78-81
            if (useTtl) state.setTimeoutDuration(ttlDuration)
            out.iterator
          }
        })
  }

  /** Streaming exact dedup — c01's batch content-hash dedup as an
    * INGEST-TIME filter: the first document per normalized content
    * hash passes, every later duplicate is dropped, across
    * micro-batches (state = one flag per seen hash). Within a batch,
    * the lowest doc_id wins, matching c01's min(doc_id) canonical
    * policy, so batch execution reproduces c01's canonical set
    * exactly (StreamDedupSpec).
    *
    * Scale: state is one boolean per DISTINCT content hash, keyed and
    * store-partitioned — the RocksDB provider (RocksDbStateSpec
    * pattern) holds 10^9 hashes on local disk. For bounded retention
    * add a processing-time timeout exactly as [[dailyFirstVisit]]
    * does; kept unexpiring here because dedup recall over the full
    * corpus is the point. */
  def streamDedupExact(spark: SparkSession, docs: Dataset[DocRow]): Dataset[DocRow] = {
    import spark.implicits._
    docs
      .groupByKey(d => normContentKey(d.text))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[DocRow], state: GroupState[SeenContent]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(SeenContent(true))
            // duplicate groups are exactly the skewed hot keys dedup
            // exists for - one-pass min, not a buffered sort
            Iterator.single(it.minBy(_.doc_id))
          }
        })
  }

  /** The normalization+hash key of [[streamDedupExact]]: lowercase,
    * collapse whitespace runs, md5 — the same normalization as
    * DedupOps.c01Exact's norm(). (Key equality is all that matters
    * for grouping; the hex form keeps state keys small.) */
  private[streaming] def normContentKey(text: String): String = {
    // null text groups under its own sentinel key (c01's md5(NULL)
    // behaves the same way: all null-text docs form one group);
    // 4 chars can never collide with a 32-char md5 hex
    if (text == null) return "null"
    val norm = text.toLowerCase.replaceAll("\\s+", " ")
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** A16 — CEP bounce detector (UserJumpDetailApp.java:84-123).
    * Pattern: an entry event (event_type=view) followed *strictly
    * next* by another entry within <10s emits the first ('match');
    * an entry whose next event arrives at ≥10s or never arrives emits
    * on watermark timeout ('timeout'). The union of both is the
    * bounce stream — the reference's declared intent (its null
    * OutputTag is a latent bug, SURVEY.md §7.4).
    *
    * Call with a watermarked stream (withWatermark on ts) so
    * EventTimeTimeout fires; in batch execution every pending entry
    * times out at EOF, which matches the batch twin's semantics. */
  def detectBounce(spark: SparkSession, events: Dataset[EventRow]): Dataset[BounceHit] = {
    import spark.implicits._
    val tenSecMs = 10000L
    val streaming = events.isStreaming // plain val: the closure must not capture the Dataset
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[EventRow], state: GroupState[PendingEntry]) => {
          def hit(p: PendingEntry, reason: String) =
            BounceHit(p.event_id, userId, new Timestamp(p.tsMs), reason)
          if (state.hasTimedOut) {
            val out = state.getOption.map(hit(_, "timeout")).iterator
            state.remove()
            out
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var pending = state.getOption
            val out = Seq.newBuilder[BounceHit]
            sorted.foreach { e =>
              val entry = e.event_type == "view"
              pending match {
                case Some(p) if e.ts.getTime - p.tsMs >= tenSecMs =>
                  out += hit(p, "timeout") // gap ≥ 10s: pattern timed out
                  pending = if (entry) Some(PendingEntry(e.event_id, e.ts.getTime)) else None
                case Some(p) =>
                  if (entry) out += hit(p, "match") // entry,entry strictly consecutive
                  pending = if (entry) Some(PendingEntry(e.event_id, e.ts.getTime)) else None
                case None =>
                  pending = if (entry) Some(PendingEntry(e.event_id, e.ts.getTime)) else None
              }
            }
            pending match {
              case Some(p) =>
                state.update(p)
                if (streaming) state.setTimeoutTimestamp(p.tsMs + tenSecMs)
              case None => state.remove()
            }
            // In batch execution timeouts never fire; emit the pending
            // entry now — EOF means no further event can complete it.
            if (!streaming) pending.foreach(p => out += hit(p, "timeout"))
            out.result().iterator
          }
        })
  }

  /** b11's STREAMING twin — the ordered funnel (view → click →
    * purchase) as a per-user state machine: emits (user_id, step, ts)
    * the moment a user FIRST completes a step, where step 2 needs a
    * click strictly after the first view and step 3 a purchase
    * strictly after the first qualifying click — the same
    * (ts, event_id)-order semantics the batch window form encodes
    * with its 1-PRECEDING frame. Events are ordered inside each
    * micro-batch; in-order per-key delivery across batches is assumed
    * (as for the other twins). State is three booleans per user —
    * O(1), never grows with traffic — and the live per-step counters
    * downstream are a plain streaming aggregation over this append
    * stream. */
  /** b13/b14's STREAMING twin — the page-transition EDGE stream:
    * per-user last-page state turns the event stream into (src, dst)
    * edges the moment the next page view arrives; self-loops are
    * dropped and malformed/missing page ids never reach the state,
    * exactly like the batch `AdsQueries.pageEdges` lag-window form.
    * Downstream, a plain streaming aggregation on (src, dst) keeps
    * the live weighted edge list that b14's transition model and an
    * incremental PageRank re-train read — the graph maintained AT
    * INGEST, no replay of the event log.
    *
    * State is ONE long per user (the last page) — strictly smaller
    * than the funnel's three booleans after encoding, and, as there,
    * in-order per-key delivery across micro-batches is assumed while
    * intra-batch order is restored by the (ts, event_id) sort. */
  def pageTransitions(spark: SparkSession,
      events: Dataset[EventRow]): Dataset[PageTransition] = {
    import org.apache.spark.sql.functions.{col, get_json_object}
    import spark.implicits._
    events.toDF()
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k")
          .cast(org.apache.spark.sql.types.LongType).as("page"))
      .where(col("page").isNotNull)
      .as[PageView]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[PageView], state: GroupState[LastPage]) => {
          val sorted = it.toSeq.sortBy(v => (v.ts.getTime, v.event_id))
          var last = state.getOption.map(_.page)
          val out = Seq.newBuilder[PageTransition]
          sorted.foreach { v =>
            last match {
              case Some(p) if p != v.page =>
                out += PageTransition(userId, p, v.page, v.ts)
              case _ => ()
            }
            last = Some(v.page)
          }
          last.foreach(p => state.update(LastPage(p)))
          out.result().iterator
        })
  }

  /** UTC epoch-day of an event timestamp — the streaming twin of the
    * batch faces' `to_date(ts)` under the session's pinned UTC zone. */
  private def epochDayOf(e: EventRow): Long =
    Math.floorDiv(e.ts.getTime, 86400000L)

  private def dayStr(epochDay: Long): String =
    java.time.LocalDate.ofEpochDay(epochDay).toString // yyyy-MM-dd

  /** b10's STREAMING twin — cohort retention maintained AT INGEST:
    * per user, the first active day fixes the cohort, and the first
    * activity at each day_offset 0..7 emits ONE (cohort, offset)
    * hit, so the live retention matrix downstream is a plain
    * streaming count over this append stream — no replay of the
    * event log. State is one long + an 8-bit mask per user (O(1));
    * as for the other twins, per-key delivery across micro-batches
    * is assumed in order while intra-batch order is restored by the
    * sort. Offsets past 7 and (with ordered delivery, impossible)
    * negative offsets are ignored — the batch face's `≤ 7` filter. */
  def retentionHits(spark: SparkSession,
      events: Dataset[EventRow]): Dataset[RetentionHit] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[EventRow], state: GroupState[RetentionState]) => {
          val days = it.map(epochDayOf).toSeq.distinct.sorted
          val out = Seq.newBuilder[RetentionHit]
          var st = state.getOption.orNull
          days.foreach { d =>
            if (st == null) st = RetentionState(d, 0)
            val off = d - st.cohortEpochDay
            if (off >= 0 && off <= 7 && (st.offsetMask & (1 << off.toInt)) == 0) {
              st = st.copy(offsetMask = st.offsetMask | (1 << off.toInt))
              out += RetentionHit(userId, dayStr(st.cohortEpochDay), off)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
        })
  }

  /** b12's STREAMING twin — rolling DAU/WAU maintained AT INGEST:
    * a user's first activity on a new day emits one `dau` hit, plus
    * one `wau` hit for every day its new trailing-7 window covers
    * that no earlier window did. With per-key ordered delivery the
    * already-covered frontier is exactly lastDay + 6, so state is
    * ONE long per user and emissions are set-exact: grouping hits
    * by (day, kind) downstream gives b12's distinct-user DAU/WAU
    * without a distinct — each (user, day) pair is emitted at most
    * once per kind. (The batch face drops window days past the
    * data's horizon with a semi-join; the live store simply holds
    * those future days' partial counts until their data arrives —
    * the parity spec restricts to realized days.) */
  def activityHits(spark: SparkSession,
      events: Dataset[EventRow]): Dataset[ActivityHit] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[EventRow], state: GroupState[LastActiveDay]) => {
          val days = it.map(epochDayOf).toSeq.distinct.sorted
          val out = Seq.newBuilder[ActivityHit]
          var last = state.getOption.map(_.epochDay)
          days.foreach { d =>
            if (last.forall(_ < d)) {
              out += ActivityHit(userId, dayStr(d), "dau")
              val from = last.map(l => math.max(d, l + 7)).getOrElse(d)
              (from to d + 6).foreach(wd =>
                out += ActivityHit(userId, dayStr(wd), "wau"))
              last = Some(d)
            }
          }
          last.foreach(l => state.update(LastActiveDay(l)))
          out.result().iterator
        })
  }

  def funnelSteps(spark: SparkSession, events: Dataset[EventRow]): Dataset[FunnelStep] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[EventRow], state: GroupState[FunnelProgress]) => {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(FunnelProgress(false, false, false))
          val out = Seq.newBuilder[FunnelStep]
          sorted.foreach { e =>
            e.event_type match {
              case "view" if !st.view =>
                st = st.copy(view = true); out += FunnelStep(userId, 1L, e.ts)
              case "click" if st.view && !st.click =>
                st = st.copy(click = true); out += FunnelStep(userId, 2L, e.ts)
              case "purchase" if st.click && !st.purchase =>
                st = st.copy(purchase = true); out += FunnelStep(userId, 3L, e.ts)
              case _ => ()
            }
          }
          state.update(st)
          out.result().iterator
        })
  }
}
