package graft.operators

import graft.SparkSpec

/** c46 duplicated-span scrub: coverage semantics at token grain —
  * exact duplicates scrub to nothing, a shared boilerplate span is
  * excised from an otherwise-novel document, overlapping hot grams
  * merge into one removed region, and short docs pass untouched. */
class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private val md5empty = "d41d8cd98f00b204e9800998ecf8427e"

  private def scrub(docs: Seq[(Long, String)]) =
    DedupOps.spanScrubOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("exact duplicates are scrubbed to nothing; a short doc passes untouched") {
    val dup = "a b c d e f g h i j" // 10 tokens, every position covered
    val got = scrub(Seq((1L, dup), (2L, dup), (3L, "tiny doc")))
    assert(got(1L) === ((10L, 10L, md5empty)))
    assert(got(2L) === ((10L, 10L, md5empty)))
    // 2 tokens < 8: no grams, nothing removed
    assert(got(3L)._1 === 2L)
    assert(got(3L)._2 === 0L)
    assert(got(3L)._3 !== md5empty)
  }

  test("a shared 8-token boilerplate span is excised; the novel remainder survives") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    // the boilerplate sits mid-document, surrounded by novel tokens
    val doc1 = s"u1 u2 u3 $boiler v1 v2 v3"
    val doc2 = s"w1 $boiler w2 w3 w4 w5 w6"
    val got = scrub(Seq((1L, doc1), (2L, doc2)))
    // only ONE hot gram exists (the exact boilerplate 8-gram: every
    // other window straddles novel tokens), so exactly its 8
    // positions are removed from each doc
    assert(got(1L) === ((14L, 8L, md5Of("u1 u2 u3 v1 v2 v3"))))
    assert(got(2L) === ((14L, 8L, md5Of("w1 w2 w3 w4 w5 w6"))))
  }

  test("overlapping hot grams merge: removed count is the union, not the sum") {
    // two docs share a 9-token run -> two overlapping hot 8-grams
    // covering 9 positions (not 16)
    val run = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    val doc1 = s"x1 $run x2"
    val doc2 = s"y1 $run y2"
    val got = scrub(Seq((1L, doc1), (2L, doc2)))
    assert(got(1L) === ((11L, 9L, md5Of("x1 x2"))))
    assert(got(2L) === ((11L, 9L, md5Of("y1 y2"))))
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
