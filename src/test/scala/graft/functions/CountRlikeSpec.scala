package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_count_rlike / graft_sum_strlen (the t19 rule-gate kernels):
  * bit-parity with the HOF forms they replaced —
  * `size(filter(arr, x -> x.rlike(re)))` (RLIKE find() semantics,
  * null elements dropped) and `aggregate(arr, 0L, (a, x) -> a +
  * length(x))` (null element POISONS the fold to null) — including
  * the null-array, empty-array and multibyte corners. */
class CountRlikeSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[Option[Seq[Option[String]]]] = {
    val rnd = new scala.util.Random(1914)
    val vocab = Seq("word", "a1b", "...", "- item", "* x", "• y", "fin...",
      "", "42", "Ω£é", "tail...", "- ", "x... y", "ALPHA", "123", "...lead")
    Seq.fill(80)(Some(Seq.fill(rnd.nextInt(12))(
      if (rnd.nextInt(12) == 0) None
      else Some(vocab(rnd.nextInt(vocab.size)))))) ++
      Seq(Some(Seq.empty), None, Some(Seq(None)), Some(Seq(Some("é€𝄞"))))
  }

  test("count_rlike equals size(filter(rlike)) on every t19 pattern") {
    val df = rows.toDF("arr")
    for (re <- Seq("[a-zA-Z]", "^(- |\\* |• )", "\\.\\.\\.$")) {
      val got = df.select(
        call_function("graft_count_rlike", col("arr"), lit(re)))
        .as[Option[Long]].collect()
      val want = df.select(
        size(filter(col("arr"), x => x.rlike(re))).cast("long"))
        .as[Option[Long]].collect()
      assert(got.toSeq == want.toSeq, s"pattern $re")
    }
  }

  test("sum_strlen equals the aggregate(+length) fold incl. null poisoning") {
    val df = rows.toDF("arr")
    val got = df.select(call_function("graft_sum_strlen", col("arr")))
      .as[Option[Long]].collect()
    val want = df.select(
      aggregate(col("arr"), lit(0L), (a, x) => a + length(x)))
      .as[Option[Long]].collect()
    assert(got.toSeq == want.toSeq)
  }
}
