package graft.operators

import graft.SparkSpec

/** c41: the audit sample is a subset of c02's verified pairs, binned
  * by the exact integer Jaccard bin, capped per bin, deterministic. */
class AuditSampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sampled pairs come from c02, bins are exact, caps hold") {
    val pairs = DedupOps.c02MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = AuditRows()
    assert(got.nonEmpty)
    got.foreach { case (bin, rk, da, db, inter, _) =>
      val (na, nb, i0) = pairs.getOrElse((da, db),
        fail(s"($da,$db) not a c02 pair"))
      assert(i0 === inter)
      assert(bin === 20L * inter / (na + nb - inter))
      assert(rk >= 1L && rk <= 10L)
    }
    // per-bin rank sequences are 1..m without gaps
    got.groupBy(_._1).foreach { case (bin, rs) =>
      assert(rs.map(_._2).sorted === (1L to rs.size.toLong), s"bin $bin")
    }
  }

  test("the draw is deterministic") {
    assert(AuditRows() === AuditRows())
  }

  private def AuditRows(): Seq[(Long, Long, Long, Long, Long, Double)] =
    DedupOps.c41AuditSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
}
