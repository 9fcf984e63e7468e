package graft.operators

import graft.SparkSpec

/** c22 product-quantization ANN: recall against the exact brute-force
  * top-k, internal rank consistency, and the no-corpus-shuffle plan
  * shape (codes are a narrow projection; the only exchanges are the
  * per-query top-k window and the presentation sort). */
class PqAnnSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("recall@10 vs exact brute force clears the documented floor") {
    val exact = topkSets(VectorOps.c06AnnBrute(spark, sf))
    val pq = topkSets(VectorOps.c22AnnPq(spark, sf))
    assert(pq.keySet === exact.keySet, "every query must be answered")
    val hits = exact.keysIterator.map(q => (pq(q) & exact(q)).size).sum
    val recall = hits.toDouble / exact.valuesIterator.map(_.size).sum
    info(f"PQ recall@10 = $recall%.3f")
    // 4-bit codes × 8 subspaces is a coarse 32-bit sketch of 256
    // bytes of floats — at 64× compression a recall floor well above
    // random (10/499 ≈ 0.02) is the claim, not near-exactness; in
    // production PQ composes with an IVF shortlist + exact re-rank.
    assert(recall >= 0.25, f"recall $recall%.3f below floor")
  }

  test("c22b IVF-PQ recall clears its floor; residual coding refines within probed cells") {
    val exact = topkSets(VectorOps.c06AnnBrute(spark, sf))
    val ivfpq = topkSets(VectorOps.c22bAnnIvfPq(spark, sf))
    assert(ivfpq.keySet === exact.keySet)
    val hits = exact.keysIterator.map(q => (ivfpq(q) & exact(q)).size).sum
    val recall = hits.toDouble / exact.valuesIterator.map(_.size).sum
    info(f"IVF-PQ recall@10 = $recall%.3f")
    // bounded above by the probe shortlist's cell coverage and below
    // by the residual codes' finer reconstruction within those cells
    assert(recall >= 0.25, f"recall $recall%.3f below floor")
  }

  test("c26 exact re-rank dominates the raw IVF-PQ recall and clears its own floor") {
    val exact = topkSets(VectorOps.c06AnnBrute(spark, sf))
    val ivfpq = topkSets(VectorOps.c22bAnnIvfPq(spark, sf))
    val rerank = topkSets(VectorOps.c26AnnRerank(spark, sf))
    assert(rerank.keySet === exact.keySet)
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.keysIterator.map(q => (got(q) & exact(q)).size).sum.toDouble /
        exact.valuesIterator.map(_.size).sum
    val rIvfpq = recall(ivfpq)
    val rRerank = recall(rerank)
    info(f"IVF-PQ recall@10 = $rIvfpq%.3f, rerank recall@10 = $rRerank%.3f")
    // two-stage bound: the exact pass restores the order of whatever
    // the widened shortlist contains — recall is capped only by cell
    // coverage (8/16 probed) and shortlist width (50), far above the
    // 32-bit sketch alone
    assert(rRerank >= rIvfpq, "re-rank must not lose recall")
    assert(rRerank >= 0.7, f"rerank recall $rRerank%.3f below floor")
    // within the shortlist the re-ranked scores are EXACT dots: any
    // returned neighbor that is also in the exact top-10 must carry
    // the exact score ordering (rank-1 agreement when present)
  }

  test("ranks are dense, scores non-increasing within each query") {
    val rows = VectorOps.c22AnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq, s"q$qid ranks")
      sorted.sliding(2).foreach {
        case Array((_, _, _, s1), (_, _, _, s2)) =>
          assert(s1 >= s2, s"q$qid scores must be non-increasing")
        case _ =>
      }
    }
  }

  test("native pqcodes/intdot/adc expressions match their relational twins row-for-row") {
    import org.apache.spark.sql.functions._
    val qe = VectorOps.quantized(spark, sf).limit(200).cache()
    val cb = VectorOps.pqSeed(spark, sf)

    // graft_pqcodes vs the per-subspace argmin-struct relational encoder
    val both = qe.select(
      VectorOps.pqCodesCol(col("qv"), cb).as("native"),
      array((0 until VectorOps.SUBS).map(m =>
        VectorOps.codeCol(m, cb(m))): _*).as("rel"))
    assert(both.filter(col("native") =!= col("rel")).count() === 0L,
      "pqcodes must equal the relational encoder on every row")

    // graft_intdot vs the aggregate/zip_with fold (self-dot: exact ints)
    val dots = qe.select(
      VectorOps.intDotCols(col("qv"), col("qv")).as("native"),
      VectorOps.intDotColsFold(col("qv"), col("qv")).as("fold"))
    assert(dots.filter(col("native") =!= col("fold")).count() === 0L,
      "intdot must equal the HOF fold on every row")

    // graft_adc vs the element_at fold against a synthetic LUT
    val ksub = VectorOps.KSUB
    val lutLit = typedLit((0 until VectorOps.SUBS * ksub).map(i => (i * 37 % 101).toLong))
    val adc = qe.select(VectorOps.pqCodesCol(col("qv"), cb).as("codes"))
      .select(
        VectorOps.adcCol(col("codes"), lutLit).as("native"),
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(VectorOps.SUBS - 1)),
            (code, m) => element_at(lutLit, m * ksub + code + 1)),
          lit(0L), (acc, x) => acc + x).as("fold"))
    assert(adc.filter(col("native") =!= col("fold")).count() === 0L,
      "adc must equal the element_at fold on every row")
    qe.unpersist()
  }

  test("plan: ADC scan never shuffles the corpus — WindowGroupLimit top-k only") {
    val df = VectorOps.c22AnnPq(spark, sf)
    df.collect() // finalize the adaptive plan
    val plan =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("WindowGroupLimit"),
      "per-query top-k must use the partial WindowGroupLimit")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"expected only the top-k window + presentation sort exchanges, got $exchanges:\n$plan")
  }
}
