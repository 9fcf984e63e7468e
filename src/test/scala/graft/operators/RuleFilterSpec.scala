package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** t19 — each structural rule trips on a crafted document and ONLY
  * that rule; a clean long English document passes all seven. */
class RuleFilterSpec extends SparkSpec {
  import spark.implicits._

  // base: 60 normal words with stopwords sprinkled in — passes all rules
  private val clean =
    (1 to 54).map(i => s"word$i").mkString(" ") + " the a of and to is"

  private def run(rows: (Long, String)*): Map[Long, Map[String, Long]] = {
    val df = TextOps.t19RuleFilterOf(rows.toSeq.toDF("doc_id", "text"))
    val cols = df.columns.filter(_ != "doc_id")
    df.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        cols.map(c => c -> r.getAs[Long](c)).toMap
    }.toMap
  }

  test("a clean document passes every rule") {
    val m = run(1L -> clean)(1L)
    assert(m("n_failed") === 0L && m("keep") === 1L)
  }

  test("each rule trips in isolation") {
    val bullets = (1 to 60).map(i => s"- item $i").mkString("\n")
    val ellipses = (1 to 60).map(i => s"line $i trails off...").mkString("\n")
    val m = run(
      1L -> ((1 to 20).map(i => s"word$i").mkString(" ") + " the a of"), // 23 words < 50
      2L -> ((1 to 54).map(_ => "xy").mkString(" ") + " the a of and to is"), // mean len ~2
      3L -> (clean + " # # # # # # #"), // 7 symbols over 67 words > 10%
      4L -> ((1 to 54).map(_ => "12345").mkString(" ") + " the a of and to is"), // digits: no alpha
      5L -> (1 to 60).map(i => s"word$i").mkString(" "), // zero stopwords
      6L -> bullets,
      7L -> ellipses)
    assert(m(1L)("r_words") === 0L && m(1L)("n_failed") === 1L)
    assert(m(2L)("r_meanlen") === 0L && m(2L)("n_failed") === 1L)
    assert(m(3L)("r_symbol") === 0L && m(3L)("n_failed") === 1L)
    assert(m(4L)("r_alpha") === 0L && m(4L)("n_failed") === 1L)
    assert(m(5L)("r_stop") === 0L && m(5L)("n_failed") === 1L)
    assert(m(6L)("r_bullet") === 0L && m(6L)("keep") === 0L)
    assert(m(7L)("r_ellipsis") === 0L && m(7L)("keep") === 0L)
    assert(m.values.forall(_("keep") === 0L))
  }

  test("null and empty text are total: every rule evaluates, nothing crashes") {
    val df = TextOps.t19RuleFilterOf(
      Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text"))
    val rows = df.collect()
    assert(rows.length === 2)
    assert(df.filter(col("keep") === 1).count() === 0L)
  }

  test("sf0.01: the word-count and stopword rules discriminate, the rest hold") {
    val agg = TextOps.t19RuleFilter(spark, "/root/testdata/sf0.01")
      .agg(
        org.apache.spark.sql.functions.sum(col("keep")),
        org.apache.spark.sql.functions.sum(col("r_words")),
        org.apache.spark.sql.functions.sum(col("r_stop")),
        org.apache.spark.sql.functions.count(col("doc_id")))
      .as[(Long, Long, Long, Long)].collect().head
    val (kept, words, stop, n) = agg
    assert(n === 500L)
    assert(kept > 0L && kept < n, "rule filter must discriminate on the fixture")
    assert(words < n, "word-count floor should reject some short docs")
    assert(stop < n, "stopword floor should reject some non-English docs")
  }

  test("t28: margin is the exact hashed-weight sum; gate follows its sign") {
    val rows = TextOps.t28ClassifierFilter(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, nTok, marginFp, margin, kept) =>
      assert(kept === (if (marginFp >= 0) 1L else 0L))
      if (nTok > 0)
        assert(margin === marginFp.toDouble / nTok.toDouble / 1000.0)
      assert(math.abs(marginFp) <= nTok * 1000L, "per-token weight bound")
    }
    // the fixture weight function must actually discriminate
    val keptCt = rows.count(_._5 == 1L)
    assert(keptCt > 0 && keptCt < rows.size,
      s"classifier gate must split the corpus (kept $keptCt of ${rows.size})")
  }
}
