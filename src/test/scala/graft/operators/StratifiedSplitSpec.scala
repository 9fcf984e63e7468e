package graft.operators

import graft.{SparkSpec, Tables}

/** t34: exact stratified split — every (source, lang) stratum yields
  * exactly ⌈n/10⌉ held-out documents, every document is assigned
  * exactly once, and the draw is deterministic. */
class StratifiedSplitSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("every stratum holds out exactly ceil(n/10), covering each doc once") {
    val rows = TextOps.t34StratifiedSplit(spark, sf)
      .as[(Long, String, String, String)].collect().toSeq
    assert(rows.map(_._1).distinct.size === rows.size) // one row per doc
    assert(rows.size === Tables.documents(spark, sf).count())
    rows.groupBy(r => (r._2, r._3)).foreach { case (stratum, rs) =>
      val n = rs.size.toLong
      val held = rs.count(_._4 == "heldout").toLong
      assert(held === (n + 9) / 10, s"stratum $stratum: n=$n held=$held")
      assert(rs.count(_._4 == "train").toLong === n - held)
    }
  }

  test("re-running draws the identical split") {
    val a = TextOps.t34StratifiedSplit(spark, sf).collect().toSeq
    val b = TextOps.t34StratifiedSplit(spark, sf).collect().toSeq
    assert(a === b)
  }
}
