package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset

/** Ingest-time boilerplate stripping (the streaming twin of batch
  * c15): paragraphs the existing corpus marks as boilerplate
  * disappear from incoming documents, unique text passes through
  * verbatim, and a boilerplate-free corpus leaves the stream
  * untouched. */
class BoilerplateIngestSpec extends SparkSpec with StreamRunner {
  import spark.implicits._

  private val P = graft.operators.DedupOps.PARA_TOKENS
  private def footer = (0 until P).map(j => s"footer$j").mkString(" ")
  private def body(tag: String) = (0 until P).map(j => s"$tag$j").mkString(" ")

  private def corpus100 = (0 until 100).map { i =>
    (i.toLong, s"${body(s"u${i}x")} $footer")
  }.toDF("doc_id", "text")

  test("corpus boilerplate is stripped from the stream; unique text survives") {
    val incoming = Seq(
      DocRow(500L, s"${body("newdoc")} $footer"), // footer must go
      DocRow(501L, body("fresh")),                // untouched
      DocRow(502L, footer))                       // fully boilerplate -> emptied
    val got = runStream(Seq(incoming)) { ds: Dataset[DocRow] =>
      Jobs.boilerplateIngest(spark, ds.toDF(), corpus100)
    }.map(d => d.doc_id -> ((d.text, d.n_removed))).toMap
    assert(got(500L) === ((body("newdoc"), 1L)))
    assert(got(501L) === ((body("fresh"), 0L)))
    assert(got(502L) === (("", 1L)))
  }

  test("ingest strip agrees with batch c15 on the same documents") {
    // Stream the corpus docs through the filter built from the same
    // corpus: every doc must come out exactly as batch c15 keeps it.
    val incoming = corpus100.as[(Long, String)].collect().toSeq
      .map { case (id, t) => DocRow(id, t) }
    val got = runStream(Seq(incoming.take(50), incoming.drop(50))) {
      ds: Dataset[DocRow] => Jobs.boilerplateIngest(spark, ds.toDF(), corpus100)
    }.map(d => d.doc_id -> ((d.text, d.n_removed))).toMap
    val want = graft.operators.DedupOps.c15ParagraphDedupOf(corpus100)
      .select("doc_id", "kept_text", "n_removed")
      .as[(Long, String, Long)].collect()
      .map { case (id, t, n) => id -> ((t, n)) }.toMap
    assert(got === want)
  }

  test("a corpus with no repeated paragraphs passes everything untouched") {
    val corpus = Seq((1L, body("only"))).toDF("doc_id", "text")
    val incoming = Seq(DocRow(9L, s"${body("only")} ${body("other")}"))
    val got = runStream(Seq(incoming)) { ds: Dataset[DocRow] =>
      Jobs.boilerplateIngest(spark, ds.toDF(), corpus)
    }
    assert(got === Seq(ScrubbedDoc(9L, s"${body("only")} ${body("other")}", 0L)))
  }
}
