package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** c18 semantic decontamination: exactness of the verify stage (no
  * false-positive documents, scores bounded by ground truth), the
  * LSH recall/cost tradeoff pinned, and the determinism that matters
  * in production — a benchmark item copied VERBATIM into the corpus
  * is always caught (identical vectors share every band). */
class SemanticDeconSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val T = 0.4 // VectorOps.NEAR_T

  /** Ground truth: exact bipartite max-dot per corpus vector. */
  private def exactHits = {
    val e = Tables.embeddings(spark, sf)
    val ev = e.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("eid"), $"embedding".as("ee"))
    e.filter($"vec_id" % 10 =!= 0)
      .crossJoin(broadcast(ev))
      .select($"vec_id", graft.functions.Portable.dot($"embedding", $"ee").as("score"))
      .filter($"score" >= T)
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n_exact"), max($"score").as("max_exact"))
  }

  test("verified hits are a subset of ground truth with bounded scores") {
    val got = VectorOps.c18SemanticDecon(spark, sf)
    val joined = got.join(exactHits, Seq("vec_id"), "left")
    // every flagged doc is a TRUE contamination (verify is exact)...
    assert(joined.filter($"n_exact".isNull).count() === 0L)
    // ...whose stats are bounded by the exhaustive comparison
    assert(joined.filter($"n_eval_hits" > $"n_exact").count() === 0L)
    assert(joined.filter($"max_score" > $"max_exact" + 1e-12).count() === 0L)
    assert(got.filter($"max_score" < T).count() === 0L)
  }

  test("doc-level recall vs exhaustive search holds the LSH bound") {
    val nExact = exactHits.count()
    val nGot = VectorOps.c18SemanticDecon(spark, sf).count()
    assert(nExact > 0L, "fixture must contain bipartite near-duplicates")
    // measured 7/10 at sf0.001 (4 bands × 4 bits, same family as c05);
    // gate at 0.5 so a banding regression is caught without pinning
    // the exact LSH draw
    assert(nGot.toDouble / nExact >= 0.5,
      s"doc recall $nGot/$nExact fell below the expected LSH band")
  }

  test("a verbatim eval copy in the corpus is ALWAYS caught") {
    val tmp = java.nio.file.Files.createTempDirectory("c18fix").toString
    val e = Tables.embeddings(spark, sf)
    // vec_id 10 is an eval vector (10 % 10 = 0); plant its exact
    // copy as corpus vec 9999 (9999 % 10 <> 0)
    val planted = e.unionByName(
      e.filter($"vec_id" === 10)
        .withColumn("vec_id", lit(9999L)))
    planted.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = VectorOps.c18SemanticDecon(spark, tmp)
      .filter($"vec_id" === 9999L).collect()
    assert(got.length === 1, "identical signatures must collide in every band")
    // unit-normalized fixture vectors: self-dot = 1 > T by a margin
    assert(got.head.getAs[Double]("max_score") > 0.99)
  }
}
