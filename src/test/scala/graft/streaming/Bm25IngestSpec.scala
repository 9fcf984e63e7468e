package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming standing-query BM25 scorer: exact score parity with the
  * batch c24 scorer when the frozen model snapshot IS the corpus, and
  * threshold gating on a hand-built fixture. */
class Bm25IngestSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stream scores == batch c24 scores on the same snapshot") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val incoming = docs.as[DocRow].collect().toSeq

    val streamed = runStream(Seq(incoming.take(200), incoming.drop(200))) {
      ds: Dataset[DocRow] => Jobs.bm25SearchIngest(spark, ds.toDF(), docs)
    }.map(h => (h.qid, h.doc_id) -> h.score).toMap

    val batch = graft.operators.SearchOps
      .bm25Scored(spark, docs, graft.operators.SearchOps.QUERIES)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    // batch emits only (query, doc) pairs with a matched term; the
    // stream's score>0 filter selects exactly the same set, and the
    // integer arithmetic makes the scores EQUAL, not approximate
    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (k, v) => assert(v === batch(k), s"$k") }
  }

  test("threshold gates standing-query hits on a hand fixture") {
    val corpus = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma"),
      (3L, "delta delta delta")).toDF("doc_id", "text")
    val q = Seq("qa" -> Seq("alpha"))
    val model = graft.operators.SearchOps.bm25Model(spark, corpus, q)
    assert(model.n === 3L && model.l === 8L && model.df === Map("alpha" -> 1L))

    val hits = runStream(Seq(Seq(
      DocRow(10L, "alpha beta alpha"),   // tf 2 — the strong hit
      DocRow(11L, "beta gamma"),         // no match
      DocRow(12L, "alpha")))) {          // tf 1, short doc
      ds: Dataset[DocRow] => Jobs.bm25SearchIngest(spark, ds.toDF(), corpus, q)
    }
    val byDoc = hits.map(h => h.doc_id -> h.score).toMap
    assert(byDoc.keySet === Set(10L, 12L))
    assert(byDoc(10L) > 0L && byDoc(12L) > 0L)

    // raising the threshold above the weaker hit keeps only the strong
    val strong = runStream(Seq(Seq(
      DocRow(10L, "alpha beta alpha"), DocRow(12L, "alpha")))) {
      ds: Dataset[DocRow] =>
        Jobs.bm25SearchIngest(spark, ds.toDF(), corpus, q,
          minScore = math.min(byDoc(10L), byDoc(12L)) + 1)
    }
    val survivors = strong.map(_.doc_id).toSet
    assert(survivors === Set(if (byDoc(10L) > byDoc(12L)) 10L else 12L))
  }
}
