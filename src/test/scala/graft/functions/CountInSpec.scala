package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_count_in (the stopword/language-hit kernel the quality
  * scorers run on every corpus pass): bit-parity with the HOF form it
  * replaced — `size(filter(toks, t -> array_contains(words, t)))` —
  * including the null corners (null array → null, null ELEMENTS never
  * match), multiplicity, and the empty array. */
class CountInSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("the", "a", "of", "and", "to", "is", "in")

  test("equals the HOF form on random token arrays + null/empty corners") {
    val rnd = new scala.util.Random(4242)
    val vocab = words ++ Seq("x", "yy", "zzz", "thee", "TH", "", "ofa")
    val rows: Seq[Option[Seq[Option[String]]]] =
      Seq.fill(60)(Some(Seq.fill(rnd.nextInt(25))(
        if (rnd.nextInt(10) == 0) None
        else Some(vocab(rnd.nextInt(vocab.size)))))) ++
        Seq(Some(Seq.empty), None, Some(Seq(None, None)))
    val df = rows.toDF("toks")
    val arr = array(words.map(lit): _*)
    val got = df.select(call_function("graft_count_in", col("toks"), arr))
      .as[Option[Long]].collect()
    val want = df.select(
      size(filter(col("toks"), t => array_contains(arr, t))).cast("long"))
      .as[Option[Long]].collect()
    assert(got.toSeq === want.toSeq)
    // sanity: at least one row actually counted something
    assert(got.flatten.exists(_ > 0))
  }

  test("multiplicity is counted, not distinct membership") {
    val df = Seq(Seq("the", "the", "the", "cat")).toDF("toks")
    val n = df.select(call_function("graft_count_in", col("toks"),
      array(words.map(lit): _*))).as[Long].head()
    assert(n === 3L)
  }
}
