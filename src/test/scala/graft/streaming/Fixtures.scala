package graft.streaming

import java.sql.Timestamp

/** Hand-computed event fixtures for the stateful-operator specs.
  * t(s) = seconds after 2024-01-01T00:00:00Z. */
object Fixtures {
  def t(sec: Long): Timestamp = new Timestamp(1704067200000L + sec * 1000)
  def tMs(ms: Long): Timestamp = new Timestamp(1704067200000L + ms)

  def ev(id: Long, sec: Long, user: Long, typ: String, value: Double = 1.0): EventRow =
    EventRow(id, t(sec), user, typ, value, s"""{"k": ${id % 10}}""")

  /** Bounce scenarios, one user each (SURVEY.md §7.4 #1 boundary
    * cases; expectations derived by hand from the CEP semantics:
    * entry=view, strictly-next, <10s match / ≥10s or EOF timeout):
    *  u1: view@0, view@5           → match(id 10) + timeout(id 11, EOF)
    *  u2: view@0, click@5          → nothing (pattern broken in time)
    *  u3: view@0, view@10 (exact)  → timeout(id 30) + timeout(id 31, EOF)
    *  u4: view@0 only              → timeout(id 40, EOF)
    *  u5: view@0, click@15         → timeout(id 50) (gap ≥ 10s)
    *  u6: click@0                  → nothing (not an entry)
    */
  val bounceEvents: Seq[EventRow] = Seq(
    ev(10, 0, 1, "view"), ev(11, 5, 1, "view"),
    ev(20, 0, 2, "view"), ev(21, 5, 2, "click"),
    ev(30, 0, 3, "view"), ev(31, 10, 3, "view"),
    ev(40, 0, 4, "view"),
    ev(50, 0, 5, "view"), ev(51, 15, 5, "click"),
    ev(60, 0, 6, "click"))

  val expectedBounceIds: Map[Long, String] = Map(
    10L -> "match", 11L -> "timeout",
    30L -> "timeout", 31L -> "timeout",
    40L -> "timeout", 50L -> "timeout")

  /** is_new repair: u1 seen on day 1 and day 2; u2 only day 2. */
  val day = 86400L
  val isNewEvents: Seq[EventRow] = Seq(
    ev(1, 10, 1, "view"), ev(2, 20, 1, "click"),
    ev(3, day + 10, 1, "view"),
    ev(4, day + 20, 2, "view"), ev(5, day + 30, 2, "view"))

  val expectedIsNew: Map[Long, String] =
    Map(1L -> "1", 2L -> "1", 3L -> "0", 4L -> "1", 5L -> "1")

  /** daily-first-visit: views only; first per (user, day) survives. */
  val uvEvents: Seq[EventRow] = Seq(
    ev(1, 10, 1, "view"), ev(2, 20, 1, "view"),
    ev(3, day + 5, 1, "view"), ev(4, day + 6, 1, "click"),
    ev(5, 30, 2, "view"))
  val expectedUvIds: Set[Long] = Set(1L, 3L, 5L)
}
