package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 corpus ops: t22 perplexity terciles, t23 dataset-card
  * rollup, t24 temperature mixing. */
class CardBucketsMixSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("t22: buckets are value-ordered terciles per language") {
    val rows = CorpusStats.t22PplBuckets(spark, sf)
      .select("lang", "lm_score", "ppl_bucket")
      .as[(String, Double, String)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, lr) =>
      val n = lr.size.toLong
      val byBucket = lr.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
      val tail = byBucket.getOrElse("tail", Nil)
      val mid = byBucket.getOrElse("middle", Nil)
      val head = byBucket.getOrElse("head", Nil)
      assert(tail.size + mid.size + head.size === lr.size)
      // value ordering: every tail score <= every middle <= every head
      if (tail.nonEmpty && mid.nonEmpty)
        assert(tail.max <= mid.min + 1e-12, s"$lang tail/middle overlap")
      if (mid.nonEmpty && head.nonEmpty)
        assert(mid.max <= head.min + 1e-12, s"$lang middle/head overlap")
      // cumulative rule: tail stops at n/3, tail+middle at 2n/3
      assert(tail.size <= n / 3, s"$lang tail overflows n/3")
      assert(tail.size + mid.size <= 2 * n / 3, s"$lang tail+middle overflows 2n/3")
    }
  }

  test("t23: rollup grains are mutually consistent") {
    val rows = CorpusStats.t23DatasetCard(spark, sf)
      .select("source", "lang", "lvl", "n_docs", "n_tokens", "n_chars")
      .as[(Option[String], Option[String], Long, Long, Long, Long)]
      .collect().toSeq
    val leaf = rows.filter(_._3 === 0L)
    val bySource = rows.filter(_._3 === 1L)
    val global = rows.filter(_._3 === 3L)
    assert(global.size === 1)
    assert(global.head._4 === leaf.map(_._4).sum)
    assert(global.head._5 === leaf.map(_._5).sum)
    assert(global.head._6 === leaf.map(_._6).sum)
    bySource.foreach { case (src, _, _, nd, nt, nc) =>
      val mine = leaf.filter(_._1 === src)
      assert(nd === mine.map(_._4).sum, s"docs mismatch for $src")
      assert(nt === mine.map(_._5).sum, s"tokens mismatch for $src")
      assert(nc === mine.map(_._6).sum, s"chars mismatch for $src")
    }
    // quality is a mean of [0,1] scores wherever defined
    CorpusStats.t23DatasetCard(spark, sf)
      .select("avg_quality").as[Option[Double]].collect()
      .flatten.foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("t29: chunks tile every document at the stride; spans cover all tokens") {
    val docs = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), "\\s+")).cast("long")
          .as("n_tok"))
      .as[(Long, Long)].collect().toMap
    val chunks = TextOps.t29Chunk(spark, sf)
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tok", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_._2)
      // indices contiguous from 0; starts at exact stride multiples
      assert(sorted.map(_._2) === (0L until sorted.size.toLong))
      sorted.foreach { case (_, idx, start, len, text) =>
        assert(start === idx * 48)
        assert(len === math.min(64L, n - start) && len >= 1)
        assert(text.split(" ", -1).length.toLong === len, s"doc $id chunk $idx")
      }
      // the last chunk reaches the end of the document
      val last = sorted.last
      assert(last._3 + last._4 === n || last._4 === 64L)
      assert(last._3 + 48 >= n, "no token can start an uncovered chunk")
    }
  }

  test("t24: minority languages upsampled, volume preserved, rates reproducible") {
    val docs = Tables.documents(spark, sf)
    val rates = TextOps.temperatureRates(docs)
      .map { case (l, b, t) => l -> (b + t / 10000.0) }.toMap
    val counts = docs.filter(col("lang").isNotNull)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // rate strictly decreasing in corpus share (α = ½ < 1)
    val ordered = counts.toSeq.sortBy(_._2).map { case (l, _) => rates(l) }
    assert(ordered === ordered.sorted(Ordering[Double].reverse),
      "temperature rates must be non-increasing in language size")
    // emitted volume stays within 10% of the corpus (normalization)
    val n = counts.values.sum.toDouble
    val emitted = TextOps.t24TemperatureMix(spark, sf).count().toDouble
    assert(math.abs(emitted - n) / n < 0.10,
      s"emitted $emitted vs corpus $n drifts > 10%")
    // per-row copies match the rate table: base <= copies <= base + 1
    val byLang = TextOps.t24TemperatureMix(spark, sf)
      .select("lang", "doc_id", "copies").distinct()
      .as[(String, Long, Long)].collect().toSeq
    byLang.foreach { case (l, _, c) =>
      val base = math.floor(rates(l)).toLong
      assert(c === base || c === base + 1, s"$l copies $c outside rate band")
    }
  }
}
