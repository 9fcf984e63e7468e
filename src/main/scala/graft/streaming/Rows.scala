package graft.streaming

import java.sql.Timestamp

/** Typed rows for the streaming operators (Dataset[T] + product
  * encoders). Mirrors the reference's Lombok beans (SURVEY.md §1.1):
  * fixed schemas on the DWM/DWS path, epoch-ms event time surfaced as
  * java.sql.Timestamp so watermarks/windows apply directly.
  */
final case class EventRow(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

/** Output of the is_new repair (BaseLogApp.java:56-90 semantics). */
final case class RepairedVisit(
    event_id: Long,
    user_id: Long,
    dt: String,
    is_new: String)

/** Output of the daily-unique-visit filter (UniqueVisitApp.java:67-106). */
final case class UniqueVisit(event_id: Long, user_id: Long, dt: String)

/** Output of the bounce detector (UserJumpDetailApp.java:84-123):
  * reason ∈ {match, timeout}, mirroring CEP select vs timeout side. */
final case class BounceHit(event_id: Long, user_id: Long, ts: Timestamp, reason: String)

/** Keyed state for the is_new repair: the user's first-seen date. */
final case class FirstVisitState(firstDate: String)

/** Keyed state for the UV filter: last date a visit was emitted.
  * The reference's 1-day state TTL (UniqueVisitApp.java:78-81) is
  * subsumed: a new day never compares equal, and the processing-time
  * timeout set by the operator evicts stale keys. */
final case class LastVisitState(lastDate: String)

/** Keyed state for the bounce detector: the pending entry event. */
final case class PendingEntry(event_id: Long, tsMs: Long)

/** A first-completion funnel step (b11's streaming twin). */
final case class FunnelStep(user_id: Long, step: Long, ts: Timestamp)

/** Keyed state for the streaming funnel: which steps completed. */
final case class FunnelProgress(view: Boolean, click: Boolean, purchase: Boolean)

/** A document flowing through an ingest stream (curation ops). */
final case class DocRow(doc_id: Long, text: String)

/** A document after ingest-time boilerplate stripping: `text` is the
  * surviving runs rejoined; `n_removed` counts stripped runs. */
final case class ScrubbedDoc(doc_id: Long, text: String, n_removed: Long)

/** A language-tagged document flowing through an ingest stream. */
final case class LangDoc(doc_id: Long, lang: String, text: String)

/** A fully-attributed document for the running dataset card. */
final case class CardDoc(doc_id: Long, text: String, lang: String,
    source: String)

/** A document scored by the DSIR ingest gate. */
final case class ScoredDoc(doc_id: Long, lang: String, n_big: Long,
    dsir_score: Double)

/** A (document, standing query) match from the BM25 ingest scorer. */
final case class SearchHit(doc_id: Long, qid: String, score: Long)

/** An embedding row flowing through a vector ingest stream. */
final case class VecRow(vec_id: Long, embedding: Seq[Float])

/** A (vector, standing query) match from the dense ingest scorer. */
final case class VecHit(vec_id: Long, qid: String, score: Double)

/** Keyed state for streaming exact dedup: whether the content hash
  * has already emitted a document. */
final case class SeenContent(seen: Boolean)

/** A parsed page view (b13/b14's node stream). */
final case class PageView(user_id: Long, ts: Timestamp, event_id: Long,
    page: Long)

/** One page transition (edge) emitted by the streaming twin of
  * AdsQueries.pageEdges. */
final case class PageTransition(user_id: Long, src: Long, dst: Long,
    ts: Timestamp)

/** Keyed state for the transition stream: the user's last page. */
final case class LastPage(page: Long)

/** One cohort-retention cell hit (b10's streaming twin): emitted the
  * first time a user is active on cohort_day + day_offset. */
final case class RetentionHit(user_id: Long, cohort_day: String,
    day_offset: Long)

/** Keyed state for streaming retention: the user's cohort epoch-day
  * and a bitmask of the ≤ 8 offsets (0..7) already emitted — O(1),
  * never grows with traffic. */
final case class RetentionState(cohortEpochDay: Long, offsetMask: Int)

/** One rolling-activity emission (b12's streaming twin): `dau` the
  * first time a user is active on `day`, `wau` the first time a
  * user's trailing-7-day window covers `day`. */
final case class ActivityHit(user_id: Long, day: String, kind: String)

/** Keyed state for rolling actives: the user's last active epoch-day
  * (one long — the emitted-wau frontier is derivable as last + 6). */
final case class LastActiveDay(epochDay: Long)
