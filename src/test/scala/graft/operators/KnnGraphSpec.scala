package graft.operators

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c34 kNN-graph structure and recall gates at sf0.001 (500 vectors):
  * the graph must be exactly top-GRAPH_K-per-vector in shape, and the
  * cell-bounded search must recover most of the brute-force graph.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val K = 5

  private lazy val graph = VectorOps.c34KnnGraph(spark, sf).cache()

  test("every vector appears with dense ranks 1..K, no self edges") {
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(graph.count() === n * K)
    assert(graph.select($"qid").distinct().count() === n)
    // ranks dense from 1, K per query
    val bad = graph.groupBy($"qid")
      .agg(count(lit(1)).as("ct"), min($"rank").as("lo"), max($"rank").as("hi"))
      .filter($"ct" =!= K || $"lo" =!= 1 || $"hi" =!= K)
    assert(bad.count() === 0L)
    assert(graph.filter($"qid" === $"nid").count() === 0L)
  }

  test("scores are non-increasing within a query, ties broken by nid") {
    val w = Window.partitionBy($"qid").orderBy($"rank")
    val bad = graph
      .withColumn("prev", lag($"score", 1).over(w))
      .withColumn("prevNid", lag($"nid", 1).over(w))
      .filter($"prev".isNotNull &&
        ($"prev" < $"score" || ($"prev" === $"score" && $"prevNid" > $"nid")))
    assert(bad.count() === 0L)
  }

  test("c35 prune quota is exactly 10% per cell, taken from the top") {
    val p = VectorOps.c35GraphPrune(spark, sf).cache()
    // quota: floor(n_cell / 10) pruned per cell (rank·100 ≤ n·10)
    val quotas = p.groupBy($"cid")
      .agg(max($"n_cell").as("n"),
        sum(when($"pruned", 1L).otherwise(0L)).as("npruned"))
      .as[(Int, Long, Long)].collect()
    quotas.foreach { case (cid, n, np) =>
      assert(np === n / 10, s"cell $cid: $np pruned of $n")
    }
    // pruned set = the cell's densest: every pruned density ≥ every
    // kept density within the cell (modulo the vec_id tie-break)
    val bad = p.as("a").join(p.as("b"),
        $"a.cid" === $"b.cid" && $"a.pruned" && !$"b.pruned" &&
          $"a.density" < $"b.density")
    assert(bad.count() === 0L)
    // density is a mean of GRAPH_K cosines of unit-norm vectors
    assert(p.filter($"deg" =!= 5 || abs($"density") > 1.0).count() === 0L)
    p.unpersist()
  }

  test("c36 incremental edges: new queries only, old neighbors only") {
    val inc = VectorOps.c36IncrementalKnn(spark, sf).cache()
    val isNew = graft.functions.Portable.h60(
      concat(lit("split:"), $"vec_id".cast("string"))) % 100 >= 80
    val e = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", isNew.as("n"))
    val newIds = e.filter($"n").select($"vec_id").as[Long].collect().toSet
    val qids = inc.select($"qid").distinct().as[Long].collect().toSet
    assert(qids === newIds) // every new vector got its edge batch
    // neighbors come exclusively from the existing corpus
    val nids = inc.select($"nid").distinct().as[Long].collect().toSet
    assert(nids.intersect(newIds).isEmpty)
    // dense ranks 1..K per query
    val bad = inc.groupBy($"qid")
      .agg(count(lit(1)).as("ct"), max($"rank").as("hi"))
      .filter($"ct" =!= $"hi" || $"hi" > 5)
    assert(bad.count() === 0L)
    inc.unpersist()
  }

  test("recall@5 vs brute force rises with nprobe and clears the bands") {
    val e = graft.Tables.embeddings(spark, sf)
    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"nid")
    val brute = e.select($"vec_id".as("qid"), $"embedding".as("qemb"))
      .crossJoin(e.select($"vec_id".as("nid"), $"embedding".as("nemb")))
      .filter($"qid" =!= $"nid")
      .select($"qid", $"nid",
        Portable.dot($"qemb", $"nemb").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(probes: Int): Double = {
      val got = VectorOps.c34KnnGraphProbes(spark, sf, probes)
        .select($"qid", $"nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(got.keySet === brute.keySet)
      val recalls = brute.map { case (q, truth) =>
        (got(q) intersect truth).size.toDouble / truth.size
      }
      recalls.sum / recalls.size
    }
    // Uniform random vectors are the worst case for cell-bounded
    // search (no cluster structure); the floors pin the measured
    // band so a regression in assignment/probing is loud, and the
    // monotonicity assertion pins the knob's direction.
    val r2 = recallAt(2)
    val r4 = recallAt(4)
    assert(r2 >= 0.25, s"recall@5 with 2 probes $r2 fell out of band")
    assert(r4 >= r2 + 0.1, s"recall knob flat: 2→$r2, 4→$r4")
    assert(recallAt(16) === 1.0) // probing every cell IS brute force
  }
}
