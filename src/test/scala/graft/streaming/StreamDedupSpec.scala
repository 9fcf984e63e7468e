package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming exact dedup: first-seen-wins across micro-batches, and
  * batch-execution parity with c01's canonical set over real data. */
class StreamDedupSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  test("first seen wins across micro-batches; later duplicates drop") {
    val b1 = Seq(DocRow(3L, "Hello  World"), DocRow(5L, "unique one"))
    // 1 < 3 but arrives in a LATER batch -> 3 already owns the hash;
    // 9 is an intra-batch duplicate of 5's content? no - of itself:
    // 8 vs 9 same content in one batch -> min doc_id (8) wins.
    val b2 = Seq(DocRow(1L, "hello world"), DocRow(9L, "fresh text"),
      DocRow(8L, "FRESH TEXT"))
    val got = runStream(Seq(b1, b2)) { ds: Dataset[DocRow] =>
      StatefulOps.streamDedupExact(spark, ds)
    }
    assert(got.map(_.doc_id).toSet === Set(3L, 5L, 8L))
  }

  test("curateIngest job: quality gate + dedup, streaming end-to-end") {
    val root = java.nio.file.Files.createTempDirectory("curate").toString
    val good = ("the a of and to is in " * 20).trim // long, stopword-rich
    // doc 2 differs only in whitespace: it PASSES the quality gate
    // (same tokens, same stopword hits) and must be removed by the
    // DEDUP stage - an uppercase twin would be dropped by the
    // case-sensitive stopword scorer before dedup ever saw it
    val dup = good.replace(" of and ", "  of  and  ")
    val lines = Seq(
      s"""{"doc_id": 1, "text": "$good"}""",
      s"""{"doc_id": 2, "text": "$dup"}""",
      s"""{"doc_id": 3, "text": "xxxxx"}""")               // junk: quality < 0.6
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/in.json"), lines.mkString("\n").getBytes)
    val raw = spark.readStream
      .schema("doc_id LONG, text STRING").json(root)
    val q = Jobs.curateIngest(spark, raw).writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/ckpt")
      .format("parquet").option("path", s"$root/out").start()
    assert(q.awaitTermination(120000))
    val out = spark.read.parquet(s"$root/out").as[DocRow].collect()
    assert(out.map(_.doc_id).toSet === Set(1L))
  }

  test("batch execution reproduces c01's canonical set over real data") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[DocRow]
    val streamingForm = StatefulOps.streamDedupExact(spark, docs)
      .collect().map(_.doc_id).toSet
    val batchTwin = graft.operators.DedupOps.c01Exact(spark, sf)
      .select(col("canonical_id")).as[Long].collect().toSet
    assert(streamingForm === batchTwin)
  }
}
