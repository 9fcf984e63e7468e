package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** graft_clf_margin (the t28/t33b hashed bag-of-words gate): bit-parity
  * with the interpreted folds it replaces — both classifier shapes —
  * including the null corners (null array → null, a null ELEMENT
  * poisons the fold to null), the empty array, and multibyte tokens. */
class ClfMarginSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[Option[Seq[Option[String]]]] = {
    val rnd = new scala.util.Random(2828)
    val vocab = Seq("the", "spark", "join", "clfb:", "", "é", "的", "x9",
      "token", "with space")
    Seq.fill(50)(Some(Seq.fill(rnd.nextInt(15))(
      if (rnd.nextInt(12) == 0) None
      else Some(vocab(rnd.nextInt(vocab.size)))))) ++
      Seq(Some(Seq.empty), None, Some(Seq(Some("a"), None)))
  }

  test("t33b shape: learned-table margin equals the element_at fold") {
    val b = 256L
    val w = Seq.tabulate(b.toInt)(j => (j * 37L) % 101L - 50L)
    val wCol = array(w.map(lit): _*)
    val df = rows.toDF("toks")
    val got = df.select(call_function("graft_clf_margin",
      col("toks"), lit("clfb:"), typedLit(w))).as[Option[Long]].collect()
    val want = df.select(aggregate(col("toks"), lit(0L),
      (acc, t) => acc + element_at(wCol,
        (Portable.h60(concat(lit("clfb:"), t)) % b + 1L)
          .cast(IntegerType)))).as[Option[Long]].collect()
    assert(got.toSeq === want.toSeq)
    assert(got.flatten.exists(_ != 0L))
  }

  test("t28 shape: the nested-hash stand-in equals the precomputed table") {
    val clfB = 4096L
    val clfQ = 1000L
    val w28 = Seq.tabulate(clfB.toInt)(j =>
      (H60.hashString("clfw:" + j) % (2 * clfQ + 1)) - clfQ)
    val df = rows.toDF("toks")
    val in = coalesce(col("toks"), array().cast(ArrayType(StringType)))
    val got = df.select(call_function("graft_clf_margin",
      in, lit(""), typedLit(w28))).as[Option[Long]].collect()
    val want = df.select(aggregate(in, lit(0L),
      (acc, t) => acc +
        (Portable.h60(concat(lit("clfw:"),
          (Portable.h60(t) % clfB).cast(StringType))) % (2 * clfQ + 1))
        - clfQ)).as[Option[Long]].collect()
    assert(got.toSeq === want.toSeq)
    assert(got.flatten.exists(_ != 0L))
  }
}
