package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c15 paragraph-level boilerplate removal: the C4-style contract —
  * a footer shared by many documents disappears, unique text
  * survives byte-for-byte, and a fully-boilerplate document stays
  * visible as an emptied row rather than vanishing. */
class ParagraphDedupSpec extends SparkSpec {

  private val P = DedupOps.PARA_TOKENS

  test("shared footer stripped from 100 docs; unique bodies survive") {
    import spark.implicits._
    val footer = (0 until P).map(j => s"footer$j").mkString(" ")
    val docs = (0 until 100).map { i =>
      val body = (0 until P).map(j => s"u${i}x$j").mkString(" ")
      (i.toLong, s"$body $footer")
    } :+ (1000L, footer) // a document that is ONLY boilerplate
    val got = DedupOps.c15ParagraphDedupOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(got.size === 101)
    (0 until 100).foreach { i =>
      val body = (0 until P).map(j => s"u${i}x$j").mkString(" ")
      assert(got(i.toLong) === ((2L, 1L, body)),
        s"doc $i: footer must be stripped, body must survive verbatim")
    }
    // all-boilerplate doc: emptied, not dropped
    assert(got(1000L) === ((1L, 1L, "")))
  }

  test("paragraphs shared by <= K docs are kept") {
    import spark.implicits._
    val para = (0 until P).map(j => s"shared$j").mkString(" ")
    // K = 2: a paragraph in exactly 2 docs is NOT boilerplate
    val docs = Seq((1L, para), (2L, para))
    val got = DedupOps.c15ParagraphDedupOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got === Map(1L -> para, 2L -> para))
  }

  test("a run repeated within one doc counts once toward df") {
    import spark.implicits._
    val para = (0 until P).map(j => s"rep$j").mkString(" ")
    // para appears twice inside doc 1 and once in doc 2: df = 2 <= K,
    // so it survives everywhere (C4 counts documents, not occurrences)
    val docs = Seq((1L, s"$para $para"), (2L, para))
    val got = DedupOps.c15ParagraphDedupOf(docs.toDF("doc_id", "text"))
      .select(col("doc_id"), col("n_removed")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("trailing partial run is its own paragraph") {
    import spark.implicits._
    // 2.5 runs: 25 tokens -> 3 paragraphs (10, 10, 5)
    val text = (0 until 25).map(j => s"t$j").mkString(" ")
    val got = DedupOps.c15ParagraphDedupOf(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(got.getLong(1) === 3L)
    assert(got.getString(3) === text) // nothing removed, order preserved
  }
}
