package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Empirical scaling probe for the dedup/ANN family: runs each query
  * at two scale factors and reports wall time, SHUFFLE BYTES (from
  * the stage-metrics listener — the quantity that decides 100 TB
  * viability, wall-time alone hides constant factors), and the
  * LSH/prefix CANDIDATE-PAIR counts whose data-proportional growth is
  * the equi-join bound's empirical check. Output: one JSON line per
  * (query, sf). Results are recorded in BASELINE.md.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    val qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "c01_dedup_exact" -> operators.DedupOps.c01Exact _,
      "c02_cand" -> operators.DedupOps.c02Cand _,
      "c02_dedup_minhash" -> operators.DedupOps.c02MinhashLsh _,
      "c03_dedup_simhash" -> operators.DedupOps.c03Simhash _,
      "c04_cand" -> operators.DedupOps.c04Cand _,
      "c04_dedup_ngram" -> operators.DedupOps.c04NgramJaccard _,
      "c05_embed_neardup" -> operators.VectorOps.c05EmbedNeardup _,
      "c06_ann_brute" -> operators.VectorOps.c06AnnBrute _,
      "c07_ann_ivf" -> operators.VectorOps.c07AnnIvf _)

    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

    // warmup (JIT/codegen) outside any measurement
    operators.DedupOps.c01Exact(spark, sfs.head).write
      .format("noop").mode("overwrite").save()

    for (sf <- sfs; (name, fn) <- qs) {
      // settle + drain listener events from the PREVIOUS query before
      // resetting counters (the bus is async and its drain API is
      // private; 3s on an idle probe box empirically suffices — the
      // byte totals are stable across repeat runs)
      Thread.sleep(3000)
      shufRead.set(0); shufWrite.set(0)
      // noop-sink materialization, same methodology as graft.Bench
      // (count() would let the optimizer drop final sorts/projections)
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(3000)
      val (r, w) = (shufRead.get, shufWrite.get)
      val rows = fn(spark, sf).count() // outside the measured window
      println(s"""{"probe":"$name","sf":"$sf","rows":$rows,"wall_sec":$wall,""" +
        s""""shuffle_read_bytes":$r,"shuffle_write_bytes":$w}""")
    }
    spark.stop()
  }
}
