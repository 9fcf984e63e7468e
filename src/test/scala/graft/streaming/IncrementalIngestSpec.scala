package graft.streaming

import graft.SparkSpec

/** Jobs.curateIngestIncremental: streaming ingest checked against a
  * static corpus index (exact + LSH near-dup) plus in-stream exact
  * dedup across micro-batches.
  */
class IncrementalIngestSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  test("drops corpus exact/near dups, keeps rest, dedups within the stream") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, Seq.fill(10)("alpha beta gamma delta").mkString(" ")))
      .toDF("doc_id", "text")

    val uniqueA = "totally novel content first variant of words"
    val out = runStream[DocRow, DocRow](Seq(
      Seq(
        DocRow(10L, base.toUpperCase),      // exact dup of corpus 1 (norm lowercases)
        DocRow(11L, base + " extra"),       // near dup of corpus 1 (jac 38/39)
        DocRow(12L, uniqueA),               // kept
        DocRow(13L, "tiny doc")),           // < 3 tokens: no shingles, kept
      Seq(
        DocRow(14L, uniqueA),               // in-stream exact dup of 12 -> dropped
        DocRow(15L, "another brand new document entirely")))) { ds =>
      Jobs.curateIngestIncremental(spark, ds.toDF(), corpus, qualityT = 0.0)
    }
    assert(out.map(_.doc_id).sorted === Seq(12L, 13L, 15L))
  }
}
