package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming running dataset card: after the stream drains, the
  * complete-mode grain table equals batch t23's leaf rows exactly
  * (integer fixed-point sums, identical division). */
class CardIngestSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("drained stream card == batch t23 leaf grain, exactly") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .as[CardDoc].collect().toSeq

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[CardDoc]
    val name = "card_" + System.nanoTime()
    val q = Jobs.cardIngest(spark, mem.toDS().toDF()).writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      // two micro-batches: the second must FOLD into the first's
      // state, not replace it
      mem.addData(docs.take(150))
      q.processAllAvailable()
      mem.addData(docs.drop(150))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table(name)
      .as[(Option[String], Option[String], Long, Long, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    val batch = graft.operators.CorpusStats.t23DatasetCard(spark, sf)
      .filter(col("lvl") === 0L)
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        col("n_chars"), col("avg_quality"))
      .as[(Option[String], Option[String], Long, Long, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    assert(got.keySet === batch.keySet, "grain cells diverge")
    got.foreach { case (k, v) => assert(v === batch(k), s"cell $k") }
  }
}
