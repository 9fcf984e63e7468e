package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native dot-product expression (graft_dot): bit-identical to
  * the HOF fold over real embeddings, in both interpreted (eval) and
  * codegen paths. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot equals the HOF fold bit-for-bit on real embeddings") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.limit(5).select($"vec_id".as("qid"), $"embedding".as("qemb"))
    val both = e.crossJoin(broadcast(q))
      .select(
        Portable.dot($"embedding", $"qemb").as("native"),
        Portable.dotFold($"embedding", $"qemb").as("fold"))
    // exact comparison — same fold order must give the same bits
    assert(both.filter($"native" =!= $"fold" ||
      ($"native".isNull =!= $"fold".isNull)).count() === 0L)
    assert(both.count() > 0L)
  }

  test("interpreted eval path matches codegen") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
        .toDF("a", "b")
        .select(Portable.dot($"a", $"b")).as[Double].head()
      assert(got === 32.0)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null array yields null; double arrays accepted") {
    val got = Seq((Option.empty[Seq[Double]], Seq(1.0, 2.0)))
      .toDF("a", "b")
      .select(Portable.dot($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
  }
}
