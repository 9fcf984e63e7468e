package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t26 BPE training pinned against an independent in-memory
  * reference implementation (same greedy rule, plain Scala), plus
  * the classic low/lower/lowest worked example. */
class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word-frequency table → first `rounds` merges. */
  private def refBpe(wc: Map[String, Long], rounds: Int): Seq[(Long, String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      wc.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (toks, c) =>
        toks.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c }
      }
      if (counts.nonEmpty) {
        val ((a, b), f) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r.toLong, a, b, f))
        segs = segs.groupMapReduce { case (toks, _) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < toks.size) {
            if (i + 1 < toks.size && toks(i) == a && toks(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += toks(i); i += 1 }
          }
          merged.result()
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def sparkBpe(wc: Map[String, Long], rounds: Int): Seq[(Long, String, String, Long)] = {
    val words = wc.toSeq.toDF("w", "wc")
      .select(col("wc"), expr(
        "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))")
        .as("toks"))
    TextOps.bpeLearn(spark, words, rounds)
      .as[(Long, String, String, Long)].collect().toSeq
  }

  test("classic low/lower/lowest merges match the reference") {
    val wc = Map("low" -> 5L, "lower" -> 2L, "lowest" -> 6L, "newest" -> 3L)
    assert(sparkBpe(wc, 6) === refBpe(wc, 6))
  }

  test("overlapping pairs merge left-to-right, non-overlapping") {
    val wc = Map("aaaa" -> 1L)
    // round 1 merges (a, a): aaaa -> [aa, aa] (2 occurrences, l-to-r)
    val got = sparkBpe(wc, 2)
    assert(got.head === ((1L, "a", "a", 3L))) // 3 adjacent pairs counted
    // round 2 then merges (aa, aa) once
    assert(got(1) === ((2L, "aa", "aa", 1L)))
  }

  test("t27 apply: per-word subword counts match the reference segmentation") {
    val wc = Map("low" -> 5L, "lower" -> 2L, "lowest" -> 6L, "newest" -> 3L)
    val merges = refBpe(wc, 6).map { case (_, a, b, _) => (a, b) }
    // reference apply: fold each merge over each word's chars
    def refSeg(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (toks, (a, b)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.size) {
          if (i + 1 < toks.size && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.result()
      }
    val docs = Seq(
      (1L, "low lower"), (2L, "lowest newest newest"))
      .toDF("doc_id", "text")
    val got = TextOps.bpeApply(docs, merges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((2L, refSeg("low").size.toLong + refSeg("lower").size.toLong)))
    assert(got(2L) === ((3L,
      refSeg("lowest").size.toLong + 2 * refSeg("newest").size.toLong)))
  }

  test("corpus training is deterministic and ranks are contiguous") {
    val a = TextOps.t26BpeLearn(spark, "/root/testdata/sf0.001")
      .as[(Long, String, String, Long)].collect().toSeq
    val b = TextOps.t26BpeLearn(spark, "/root/testdata/sf0.001")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(a === b)
    assert(a.map(_._1) === (1L to a.size.toLong))
    // frequencies are positive and the merge table is non-trivial
    assert(a.nonEmpty && a.forall(_._4 > 0))
    // the reference implementation agrees on the real corpus too
    val wc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(a === refBpe(wc, a.size))
  }

  test("t27 reuses the persisted model while the token matches; drift retrains") {
    val sf = "/root/testdata/sf0.001"
    val metaTable = s"graft_bpe_meta_${Integer.toHexString(sf.hashCode)}"
    val mergeTable = s"graft_bpe_merges_${Integer.toHexString(sf.hashCode)}"
    // first apply trains + persists; answers pin to the live trainer
    val first = TextOps.t27BpeApply(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val liveMerges = TextOps.t26BpeLearn(spark, sf)
      .as[(Long, String, String, Long)].collect().toSeq
    val storedMerges = spark.table(mergeTable).orderBy("rank")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(storedMerges === liveMerges)
    // token current → a second apply must NOT rebuild (stable token)
    val tok1 = spark.table(metaTable).as[String].collect().head
    val second = TextOps.t27BpeApply(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(second === first)
    assert(spark.table(metaTable).as[String].collect().head === tok1)
    // corrupt the token → next apply retrains and restores the token
    Seq("stale").toDF("token").write.mode("overwrite")
      .format("parquet").saveAsTable(metaTable)
    val third = TextOps.t27BpeApply(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(third === first)
    val tok = spark.table(metaTable).as[String].collect().head
    assert(tok !== "stale")
  }
}
