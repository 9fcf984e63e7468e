package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Ingest-time exact-substring dedup (the c19 twin): recall 1.0
  * against the exact fingerprint intersection (Bloom + winnowing
  * both have no false negatives at the guarantee length), bounded
  * over-drop of clean docs, and inert edges (null/short text, empty
  * corpus). */
class SubstringIngestSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def randish(tag: String, n: Int): String =
    (0 until n).map(i => ('a' + (graft.functions.H60.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"$tag:$i")) % 26)).toChar).mkString

  test("a doc sharing a 64-char corpus run is dropped; unique/null/short pass") {
    val footer = randish("footer", 64)
    val corpus = (1L to 3L).map(i => i -> s"${randish(s"c$i", 90)}$footer")
      .toDF("doc_id", "text")
    val incoming = Seq(
      DocRow(10L, s"${randish("in", 51)}$footer"),
      DocRow(11L, randish("unique", 150)),
      DocRow(12L, null),
      DocRow(13L, randish("tiny", 20)))
    val kept = runStream(Seq(incoming)) {
      ds: Dataset[DocRow] => Jobs.substringDupIngest(spark, ds.toDF(), corpus)
    }.map(_.doc_id).toSet
    assert(kept === Set(11L, 12L, 13L))
  }

  test("real-corpus recall 1.0 vs the exact fingerprint intersection; over-drop bounded") {
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" < 400)
    val incomingDf = docs.filter($"doc_id" >= 400)
    val incoming = incomingDf.select($"doc_id", $"text").as[DocRow].collect().toSeq

    // exact truth, no sketch: incoming docs whose fingerprint set
    // touches the corpus fingerprint set
    val corpusFp = corpus.select(explode(
      graft.operators.DedupOps.winnowFps($"text")).as("fp")).distinct()
    val trueDups = incomingDf
      .select($"doc_id", explode(graft.operators.DedupOps.winnowFps($"text")).as("fp"))
      .join(corpusFp, Seq("fp"), "left_semi")
      .select($"doc_id").as[Long].collect().toSet

    val kept = runStream(Seq(incoming.take(50), incoming.drop(50))) {
      ds: Dataset[DocRow] => Jobs.substringDupIngest(spark, ds.toDF(), corpus)
    }.map(_.doc_id).toSet

    assert(kept.intersect(trueDups).isEmpty,
      "a true substring-dup survived the ingest filter")
    val clean = incoming.map(_.doc_id).toSet -- trueDups
    val overDropped = clean -- kept
    assert(overDropped.size <= math.max(2, clean.size / 20),
      s"over-drop ${overDropped.size} of ${clean.size} clean docs")
  }

  test("empty corpus passes everything through") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val incoming = Seq(DocRow(1L, randish("x", 100)), DocRow(2L, null))
    val kept = runStream(Seq(incoming)) {
      ds: Dataset[DocRow] => Jobs.substringDupIngest(spark, ds.toDF(), corpus)
    }.map(_.doc_id).toSet
    assert(kept === Set(1L, 2L))
  }
}
