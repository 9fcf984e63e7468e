package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming DSIR ingest gate: exact score parity with the batch
  * scorer when the model snapshot contains the streamed docs, the
  * no-evidence ceiling for unseen content, and threshold gating. */
class DsirIngestSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stream scores == batch scores when the model covers the docs") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    val incoming = docs.as[LangDoc].collect().toSeq

    val streamed = runStream(Seq(incoming.take(200), incoming.drop(200))) {
      ds: Dataset[LangDoc] => Jobs.dsirScoreIngest(spark, ds.toDF(), docs)
    }.map(r => r.doc_id -> ((r.n_big, r.dsir_score))).toMap

    val batch = graft.operators.TextOps.dsirScores(docs, "en").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap

    assert(streamed.keySet === batch.keySet,
      "every featured doc must be scored on both faces")
    // integer fold + identical divisions ⇒ EXACT equality, not approx
    streamed.foreach { case (id, got) =>
      assert(got === batch(id), s"doc $id")
    }
  }

  test("unseen content scores the no-evidence ceiling; threshold gates") {
    val corpus = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha beta gamma delta"),
      (3L, "de", "foo bar baz qux")).toDF("doc_id", "lang", "text")
    val targetLike = LangDoc(10L, "de", "alpha beta gamma delta")
    val offTarget = LangDoc(11L, "de", "foo bar baz qux")
    val unseen = LangDoc(12L, "de", "zz1 zz2 zz3")
    val short = LangDoc(13L, "de", "one") // < 2 tokens: no features

    val got = runStream(Seq(Seq(targetLike, offTarget, unseen, short))) {
      ds: Dataset[LangDoc] => Jobs.dsirScoreIngest(spark, ds.toDF(), corpus)
    }.map(r => r.doc_id -> r.dsir_score).toMap

    assert(!got.contains(13L), "featureless docs are dropped")
    // unseen buckets: ct = cr = 0 → ratio exactly 1.0
    assert(got(12L) === 1.0)
    // target-like (ct=2,cr=2 per bucket → 3/3·2^30 exactly 1.0 ≥)
    // outranks off-target (ct=0,cr=1 → 1/2)
    assert(got(10L) > got(11L))
    assert(got(11L) === 0.5)

    // threshold keeps only the target-like and unseen rows
    val gated = runStream(Seq(Seq(targetLike, offTarget, unseen))) {
      ds: Dataset[LangDoc] =>
        Jobs.dsirScoreIngest(spark, ds.toDF(), corpus, minScore = 0.9)
    }.map(_.doc_id).toSet
    assert(gated === Set(10L, 12L))
  }
}
