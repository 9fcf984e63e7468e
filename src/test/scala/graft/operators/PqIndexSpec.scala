package graft.operators

import graft.SparkSpec

/** c22c — the persisted IVF-PQ layout. Pins the claims the operator
  * makes: (1) answers are bit-identical to c22b (same coarse
  * quantizer, same residual codebooks, same integer ADC scores);
  * (2) the read path is bucket-pruned and joins without a keyed
  * exchange below the top-k window; (3) reading beats the full
  * train+encode+scan lifecycle. */
class PqIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test("c22c equals c22b row-for-row; read path plan and speedup") {
    VectorOps.buildIvfPqIndex(spark, sf)

    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

    val (got, _) = time(run(VectorOps.c22cAnnIvfPqPersisted(spark, sf)))
    val want = run(VectorOps.c22bAnnIvfPq(spark, sf))
    assert(got === want)

    val q = VectorOps.c22cAnnIvfPqPersisted(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SelectedBucketsCount"),
      "codes scan lost bucket pruning (cell filter must prune bucket files)")
    assert(plan.contains("BroadcastHashJoin"),
      "probe join must broadcast the (tiny) probe list")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1,
      s"read path must shuffle only the top-k window input, got $exchanges keyed exchanges:\n$plan")

    // structural sanity only (the full ratio is recorded in
    // BASELINE.md; see IvfIndexSpec's flakiness note)
    def median3(f: => Unit): Double =
      Seq.fill(3)(time(f)._2).sorted.apply(1)
    val sfBig = "/root/testdata/sf0.1"
    VectorOps.buildIvfPqIndex(spark, sfBig)
    val readT = median3(VectorOps.c22cAnnIvfPqPersisted(spark, sfBig)
      .write.format("noop").mode("overwrite").save())
    val fullT = median3(VectorOps.c22bAnnIvfPq(spark, sfBig)
      .write.format("noop").mode("overwrite").save())
    info(f"c22c read $readT%.3fs vs c22b full $fullT%.3fs (${fullT / readT}%.1fx)")
    assert(readT < fullT,
      f"persisted read path slower than the full lifecycle: read $readT%.3fs, full $fullT%.3fs")
  }

  test("c26b equals c26 row-for-row and serves the re-rank from the index") {
    VectorOps.buildIvfPqIndex(spark, sf)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = run(VectorOps.c26bAnnRerankPersisted(spark, sf))
    val want = run(VectorOps.c26AnnRerank(spark, sf))
    assert(got === want)

    // the served composition must keep the persisted shortlist's
    // bucket pruning — the re-rank stage must not re-introduce a
    // corpus-wide scan of the codes table
    val q = VectorOps.c26bAnnRerankPersisted(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SelectedBucketsCount"),
      "shortlist scan lost bucket pruning under the re-rank composition")
  }
}
