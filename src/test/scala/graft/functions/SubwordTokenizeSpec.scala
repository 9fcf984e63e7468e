package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** The subword tokenizer (t03b): greedy longest-match semantics,
  * total coverage via single-char fallback, generator ≡ scalar
  * parity, and t09 packing parity under subword counts. */
class SubwordTokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("greedy longest-match with single-char fallback") {
    assert(SubwordTokenize.tokens("stream").toSeq === Seq("stream"))
    assert(SubwordTokenize.tokens("fast").toSeq === Seq("fa", "st"))
    assert(SubwordTokenize.tokens("slow").toSeq === Seq("slo", "w"))
    assert(SubwordTokenize.tokens("customer").toSeq === Seq("custom", "er"))
    // wholly unknown input degrades to characters, never fails
    assert(SubwordTokenize.tokens("qzx").toSeq === Seq("q", "z", "x"))
  }

  test("segmentation is total: tokens rejoin to the original words") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text")).as[String].take(50)
    texts.foreach { t =>
      val words = t.split("\\s+").filter(_.nonEmpty).mkString("")
      assert(SubwordTokenize.tokens(t).mkString("") === words)
    }
  }

  test("generator rows == scalar array, with consecutive positions") {
    val df = spark.read.parquet(s"$sf/documents.parquet").limit(20)
      .select(col("doc_id"), col("text"))
    df.createOrReplaceTempView("swt_docs")
    val gen = spark.sql(
      """SELECT doc_id, token, pos
        |FROM swt_docs LATERAL VIEW graft_subword(text) AS token, pos""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val arr = spark.sql(
      """SELECT doc_id, token, CAST(pos AS BIGINT) AS pos FROM (
        |  SELECT doc_id, posexplode(graft_subword_arr(text)) AS (pos, token)
        |  FROM swt_docs)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(gen === arr)
    spark.catalog.dropTempView("swt_docs")
  }

  test("t09c packing parity: same layout algebra as t09 under subword counts") {
    val packed = TextOps.t09cPackSubword(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    // n_tok must be the subword count, and within each shard (ordered
    // by doc_id) start offsets must be the running sum — the exact
    // invariant t09 holds for whitespace counts
    packed.foreach { case (id, _, n, _, _) =>
      assert(n === SubwordTokenize.tokens(texts(id)).length.toLong, s"doc $id")
    }
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var running = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, bin, off) =>
        assert(bin === running / 2048, s"doc $id bin")
        assert(off === running % 2048, s"doc $id offset")
        running += n
      }
    }
  }

  test("non-BMP fallback keeps a surrogate pair as ONE token") {
    // U+1F600 is two UTF-16 code units; the fallback must advance by
    // Character.charCount, never splitting it into lone surrogates
    val emoji = new String(Character.toChars(0x1F600))
    assert(SubwordTokenize.tokens(emoji + emoji).toSeq === Seq(emoji, emoji))
    val mixed = SubwordTokenize.tokens("fast" + emoji + "st").toSeq
    assert(mixed === Seq("fa", "st", emoji, "st"))
    // every emitted token is a well-formed code-point sequence
    mixed.foreach { t =>
      assert(!Character.isLowSurrogate(t.charAt(0)), s"lone low surrogate in $t")
      assert(!Character.isHighSurrogate(t.charAt(t.length - 1)),
        s"dangling high surrogate in $t")
    }
  }

  test("t03b is total over null text: 0 tokens, empty stream") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "fast"))
      .toDF("doc_id", "text")
    val got = TextOps.subwordTokens(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array((1L, 0L, 0L, ""), (2L, 1L, 2L, "fa st")))
  }
}
