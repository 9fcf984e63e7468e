package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Ingest-time decontamination: recall 1.0 against the batch c09
  * report (no contaminated doc survives — the Bloom sketch has no
  * false negatives) and a bounded over-drop of clean documents (the
  * sketch's false-positive trade). */
class DecontaminateIngestSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("every batch-flagged doc is dropped; clean over-drop is bounded") {
    val docs = graft.Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val incoming = docs.filter(col("doc_id") % 10 =!= 0)
      .select($"doc_id", $"text").as[DocRow].collect().toSeq

    val kept = runStream(Seq(incoming.take(100), incoming.drop(100))) {
      ds: Dataset[DocRow] => Jobs.decontaminateIngest(spark, ds.toDF(), evalDocs)
    }.map(_.doc_id).toSet

    // batch truth: c09 flags exactly the docs with any eval overlap
    val flagged = graft.operators.DedupOps.c09Decontaminate(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(flagged.nonEmpty, "fixture must exercise contamination")
    assert(kept.intersect(flagged).isEmpty,
      "a contaminated doc survived the ingest filter")

    // over-drop: clean docs killed by Bloom false positives
    val clean = incoming.map(_.doc_id).toSet -- flagged
    val overDropped = clean -- kept
    assert(overDropped.size <= math.max(2, clean.size / 20),
      s"over-drop ${overDropped.size} of ${clean.size} clean docs")
  }

  test("short docs (no ngrams) always pass; empty eval set passes everything") {
    val evalDocs = Seq((1000L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
      .toDF("doc_id", "text")
    val shortDoc = DocRow(1L, "too short")
    val contaminated = DocRow(2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 tail")
    val got = runStream(Seq(Seq(shortDoc, contaminated))) {
      ds: Dataset[DocRow] => Jobs.decontaminateIngest(spark, ds.toDF(), evalDocs)
    }.map(_.doc_id).toSet
    assert(got === Set(1L))

    val emptyEval = evalDocs.filter(lit(false))
    val got2 = runStream(Seq(Seq(shortDoc, contaminated))) {
      ds: Dataset[DocRow] => Jobs.decontaminateIngest(spark, ds.toDF(), emptyEval)
    }.map(_.doc_id).toSet
    assert(got2 === Set(1L, 2L))
  }

  test("bloom cap raise is scoped to the sketch build, then restored") {
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevItems = spark.conf.get(itemsKey)
    val prevBits = spark.conf.get(bitsKey)
    try {
      // caps far below the ingest floor (4096 items / 28 bits each)
      // force the raise path; after the eager sketch build inside
      // decontaminateIngest, the session must see the old values
      spark.conf.set(itemsKey, "100")
      spark.conf.set(bitsKey, "1000")
      val evalDocs = Seq((1000L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
        .toDF("doc_id", "text")
      val raw = Seq((1L, "plain clean words here")).toDF("doc_id", "text")
      Jobs.decontaminateIngest(spark, raw, evalDocs)
      assert(spark.conf.get(itemsKey) === "100",
        "items cap must be restored after the sketch build")
      assert(spark.conf.get(bitsKey) === "1000",
        "bits cap must be restored after the sketch build")
    } finally {
      spark.conf.set(itemsKey, prevItems)
      spark.conf.set(bitsKey, prevBits)
    }
  }
}
