package graft.operators

import graft.SparkSpec

/** c42 content-defined chunking: identical content chunks
  * identically, and — the property fixed-stride chunking lacks — a
  * leading insertion re-synchronizes, so later chunks still dedup. */
class CdcDedupSpec extends SparkSpec {
  import spark.implicits._

  private def randText(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    val sb = new StringBuilder
    while (sb.length < n) sb.append(('a' + r.nextInt(26)).toChar)
    sb.toString
  }

  test("two identical docs share every chunk, covering the full text") {
    val t = randText(42, 2000)
    val out = DedupOps.c42CdcDedupOf(Seq((1L, t), (2L, t)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (_, _, nOcc, nDocs) =>
      assert(nOcc === 2L); assert(nDocs === 2L)
    }
    // every chunk recurs exactly twice, so the recurring chunks tile
    // the document completely
    assert(out.map(_._2).sum === t.length.toLong)
  }

  test("a leading insertion re-synchronizes: later chunks still dedup") {
    val t = randText(7, 4000)
    val shifted = "XYZQ" + t
    val out = DedupOps.c42CdcDedupOf(
      Seq((1L, t), (2L, shifted)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val cross = out.filter(_._4 == 2L)
    assert(cross.nonEmpty, "no chunk survived a 4-char prefix insertion")
    // most of the content should re-align — boundaries are decided by
    // content, so only the first chunk differs
    assert(cross.map(_._2).sum > t.length / 2,
      s"only ${cross.map(_._2).sum} of ${t.length} chars re-aligned")
  }

  test("chunking is deterministic and the query face matches the Of face") {
    val sf = "/root/testdata/sf0.001"
    val a = DedupOps.c42CdcDedup(spark, sf).collect().toSeq
    val b = DedupOps.c42CdcDedup(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("low-entropy text: bounded uniform chunks, no 1-char storm, no unbounded chunk") {
    // "aaaa…" makes every window hash identical: either every window
    // cuts (the pre-bounds 1-char-chunk storm) or none does (one
    // n-char chunk). The min/max bounds must collapse both cases to
    // ~CDC_MAX-uniform chunks.
    val t = "a" * 5000
    val out = DedupOps.c42CdcDedupOf(Seq((1L, t), (2L, t)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (_, len, _, nDocs) =>
      assert(len <= DedupOps.CDC_MAX, s"chunk of $len chars exceeds the max bound")
      assert(nDocs === 2L)
    }
    val chunksPerDoc = out.map(_._3).sum / 2
    assert(chunksPerDoc >= t.length / DedupOps.CDC_MAX,
      "max bound failed to cut an over-long gap")
    assert(chunksPerDoc <= t.length / DedupOps.CDC_MIN + 2,
      s"$chunksPerDoc chunks/doc — the min bound did not stop the chunk storm")
  }

  test("bounds hold on random text too: every chunk is at most CDC_MAX") {
    val t = randText(11, 6000)
    val out = DedupOps.c42CdcDedupOf(Seq((1L, t), (2L, t)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._2 <= DedupOps.CDC_MAX))
  }

  test("short and single-char docs chunk as one whole-text chunk") {
    val out = DedupOps.c42CdcDedupOf(
      Seq((1L, "ab"), (2L, "ab"), (3L, "x")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // "ab" is shorter than the window: no cut windows exist, the
    // whole text is the chunk, and the pair dedups
    assert(out.map(r => (r._2, r._3, r._4)) === Seq((2L, 2L, 2L)))
  }
}
