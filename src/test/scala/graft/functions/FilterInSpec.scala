package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_filter_in (the BM25 postings-restriction kernel on c24/c28's
  * one corpus pass): bit-parity with the HOF form it replaced —
  * `filter(toks, t -> t.isInCollection(words))` — including the null
  * corners (null array → null, null ELEMENTS are dropped), order,
  * multiplicity, and the empty array. */
class FilterInSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("spark", "window", "hash", "join", "merge",
    "vector", "query", "stream", "batch", "zzzunseen")

  test("equals the HOF form on random token arrays + null/empty corners") {
    val rnd = new scala.util.Random(1717)
    val vocab = words ++ Seq("x", "yy", "zzz", "sparkx", "SPARK", "", "que")
    val rows: Seq[Option[Seq[Option[String]]]] =
      Seq.fill(60)(Some(Seq.fill(rnd.nextInt(25))(
        if (rnd.nextInt(10) == 0) None
        else Some(vocab(rnd.nextInt(vocab.size)))))) ++
        Seq(Some(Seq.empty), None, Some(Seq(None, None)))
    val df = rows.toDF("toks")
    val got = df.select(call_function("graft_filter_in",
      col("toks"), typedlit(words))).as[Option[Seq[String]]].collect()
    val want = df.select(filter(col("toks"), t => t.isInCollection(words)))
      .as[Option[Seq[String]]].collect()
    assert(got.toSeq === want.toSeq)
    // sanity: at least one row actually kept something
    assert(got.flatten.exists(_.nonEmpty))
  }

  test("order and multiplicity are preserved") {
    val df = Seq(Seq("join", "cat", "spark", "join", "dog", "spark")).toDF("toks")
    val kept = df.select(call_function("graft_filter_in",
      col("toks"), typedlit(words))).as[Seq[String]].head()
    assert(kept === Seq("join", "spark", "join", "spark"))
  }
}
