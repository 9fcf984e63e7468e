package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed pins for the round-4 pipeline operators: t08
  * repetition signals, t09 sharded sequence packing, t10 stratified
  * mixing, c11 within-cell semantic dedup.
  */
class MixPackRepeatSpec extends SparkSpec {
  import spark.implicits._

  test("t08 repetition signals on crafted texts") {
    val docs = Seq(
      (1L, "a a a b"), // 4 toks, 2 distinct, top=3; bigrams [a a, a a, a b] → dup 1/3
      (2L, "x"),       // 1 tok → no bigrams, dup 0.0
      (3L, "p q p q")  // bigrams [p q, q p, p q] → dup 1/3; top 2/4
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionCols(docs)
      .as[(Long, Long, Long, Double, Long, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 2L, 0.5, 3L, 0.75, 3L, 1.0 / 3.0)))
    assert(got(2L) === ((2L, 1L, 1L, 1.0, 1L, 1.0, 0L, 0.0)))
    assert(got(3L) === ((3L, 4L, 2L, 0.5, 2L, 0.5, 3L, 1.0 / 3.0)))
  }

  test("t09 packing fills bins contiguously per shard") {
    // one shard → packing order is doc_id order; ctx=10 exercises
    // bin rollover and a doc spanning a boundary (doc 3 starts at 9).
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, words(4)), (2L, words(5)), (3L, words(3)), (4L, words(7)))
      .toDF("doc_id", "text")
    val got = TextOps.packSequences(docs, shards = 1, ctx = 10)
      .select($"doc_id", $"bin", $"tok_offset").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((0L, 0L)), 2L -> ((0L, 4L)), 3L -> ((0L, 9L)), 4L -> ((1L, 2L))))
    // the span manifest: doc 3 (tokens 9..11) straddles the bin
    // boundary — one token in bin 0, two in bin 1
    val spans = TextOps.packSpans(docs, shards = 1, ctx = 10)
      .select($"doc_id", $"bin", $"seg_off", $"seg_len")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(spans === Seq(
      (1L, 0L, 0L, 4L), (2L, 0L, 0L, 5L),
      (3L, 0L, 0L, 1L), (3L, 1L, 1L, 2L),
      (4L, 1L, 0L, 7L)))
    // segments tile every doc exactly: per-doc seg_len sums to n_tok
    val nTok = Map(1L -> 4L, 2L -> 5L, 3L -> 3L, 4L -> 7L)
    assert(spans.groupBy(_._1).forall { case (id, ss) =>
      ss.map(_._4).sum == nTok(id)
    })
  }

  test("t10 mixing: whole rates exact, fractional rates bounded + deterministic") {
    val docs = (0L until 200L).map { i =>
      (i, if (i % 2 == 0) "whole" else "frac", "t")
    }.toDF("doc_id", "lang", "text")
    val rates = Seq(("whole", 2, 0), ("frac", 0, 5000)) // 2.0× and 0.5×
    val out = TextOps.mixSample(docs, rates)
      .select($"doc_id", $"lang", $"copies", $"epoch")
      .as[(Long, String, Long, Long)].collect()
    val whole = out.filter(_._2 == "whole")
    // every even doc appears exactly twice, epochs 1 and 2
    assert(whole.length === 200)
    assert(whole.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._4).sorted.toSeq == Seq(1L, 2L) && rs.forall(_._3 == 2L)
    })
    val frac = out.filter(_._2 == "frac")
    // ~50 of 100 expected; the portable hash fixes the exact subset
    assert(frac.forall(r => r._3 == 1L && r._4 == 1L))
    assert(frac.length > 30 && frac.length < 70)
    val again = TextOps.mixSample(docs, rates)
      .select($"doc_id", $"lang", $"copies", $"epoch")
      .as[(Long, String, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._4)).toSeq === again.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("t10 mixing runs unchanged under a stream (stateless batch/stream duality)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val docs = (0L until 50L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val rates = Seq(("a", 2, 0), ("b", 0, 5000))
    val batch = TextOps.mixSample(
      docs.toDF("doc_id", "lang"), rates)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val mem = MemoryStream[(Long, String)]
    val q = TextOps.mixSample(mem.toDS().toDF("doc_id", "lang"), rates)
      .writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    mem.addData(docs)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("mix_stream")
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(streamed === batch)
  }

  test("c13 incremental dedup: exact/near/kept statuses, batch-internal dups ignored") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, false),                                    // existing
      (2L, Seq.fill(10)("alpha beta gamma delta").mkString(" "), false),
      (10L, base.toUpperCase, true),                        // exact dup of 1 (norm lowercases)
      (11L, base + " extra", true),                         // near dup of 1 (jac 38/39)
      (12L, "completely different words here entirely novel", true),
      (13L, Seq.fill(8)("sibling batch duplicate text").mkString(" "), true),
      (14L, Seq.fill(8)("sibling batch duplicate text").mkString(" "), true))
      .toDF("doc_id", "text", "__new")
    val got = DedupOps.incrementalDedup(docs)
      .as[(Long, String)].collect().toMap
    // 13/14 duplicate EACH OTHER but nothing in the existing corpus —
    // incremental dedup must NOT flag batch-internal pairs (that's
    // the in-batch c02 pass's job)
    assert(got === Map(
      10L -> "exact_dup", 11L -> "near_dup", 12L -> "kept",
      13L -> "kept", 14L -> "kept"))
  }

  test("c12 k-means: every vector assigned once, per-cell stats consistent") {
    val d = "/root/testdata/sf0.001"
    val rows = VectorOps.c12KmeansCells(spark, d)
      .select($"cid", $"dim", $"n_members", $"sum_q", $"mean_q")
      .as[(Int, Long, Long, Long, Double)].collect()
    val nVec = graft.Tables.embeddings(spark, d).count()
    // each member contributes one row per dim: per-cid n is constant
    // across the 64 dims, and cids partition the corpus
    val byCid = rows.groupBy(_._1)
    byCid.foreach { case (_, rs) =>
      assert(rs.map(_._3).distinct.length === 1)
      assert(rs.map(_._2).sorted.toSeq === (1L to 64L))
    }
    assert(byCid.map { case (_, rs) => rs.head._3 }.sum === nVec)
    // mean is exactly sum/n in double
    rows.foreach { case (_, _, n, s, m) => assert(m === s.toDouble / n.toDouble) }
    // deterministic across runs (the literal-centroid collect path)
    val again = VectorOps.c12KmeansCells(spark, d)
      .select($"cid", $"dim", $"sum_q").as[(Int, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2, r._4)).sorted.toSeq === again.sorted.toSeq)
  }

  test("c11 semantic dedup: exact within cells, subset of global near-dups") {
    val d = "/root/testdata/sf0.001"
    val got = VectorOps.c11SemanticDedup(spark, d)
      .select($"ia", $"ib", $"score").as[(Long, Long, Double)].collect()
    assert(got.forall(_._3 >= 0.4)) // every pair is a genuine near-dup
    val e = graft.Tables.embeddings(spark, d)
    val cid = VectorOps.cellAssign(e, VectorOps.anchorVectors(spark, d, 16))
      .select($"vec_id", $"cid").as[(Long, Int)].collect().toMap
    val all = e.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    val brute = (for {
      (ia, ea) <- all; (ib, eb) <- all if ia < ib && dot(ea, eb) >= 0.4
    } yield (ia, ib)).toSet
    val sameCell = brute.filter { case (a, b) => cid(a) == cid(b) }
    // c11 = exactly the same-cell near-dups: no false pairs, and no
    // same-cell pair missed; cross-cell misses are the documented
    // recall trade.
    assert(got.map(p => (p._1, p._2)).toSet === sameCell)
  }
}
