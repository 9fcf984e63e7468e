package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{Dataset, Encoder}

/** Shared MemoryStream micro-batch driver for the stateful specs. */
trait StreamRunner { self: SparkSpec =>

  /** Run a streaming Dataset op over a MemoryStream fed in `batches`,
    * collecting all Append-mode output. */
  def runStream[I: Encoder, O: Encoder](
      batches: Seq[Seq[I]])(op: Dataset[I] => Dataset[O]): Seq[O] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[I]
    val q = op(mem.toDS()).writeStream
      .format("memory").queryName("out_" + System.nanoTime())
      .outputMode(OutputMode.Append).start()
    // Failsafe: ProcessingTimeTimeout queries re-trigger no-data
    // batches continuously; if processAllAvailable ever wedges, kill
    // the query so the test fails instead of hanging the suite.
    val killer = new Thread(() => { Thread.sleep(120000); if (q.isActive) q.stop() })
    killer.setDaemon(true)
    killer.start()
    try {
      batches.foreach { b =>
        val target = mem.addData(b).json.replace("\"", "").toLong
        // processAllAvailable alone races with the continuous no-data
        // batches that stateful timeouts trigger — it can return
        // before the just-added offset is processed. Poll the last
        // progress until the source's end offset covers the add.
        val deadline = System.currentTimeMillis() + 60000
        var done = false
        while (!done && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          val p = q.lastProgress
          done = p != null && p.sources.nonEmpty &&
            p.sources(0).endOffset != null &&
            p.sources(0).endOffset.replace("\"", "").toLong >= target
          if (!done) Thread.sleep(50)
        }
        assert(done, s"stream did not reach offset $target within 60s")
      }
    } finally q.stop()
    import spark.implicits._
    spark.table(q.name).as[O].collect().toSeq
  }
}
