package graft.operators

import graft.SparkSpec

/** t17 DSIR importance resampling: documents whose hashed-bigram
  * distribution matches the target slice outrank off-target text
  * within their stratum, and the quantized ratio floor is exact. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like text outranks off-target text within a stratum") {
    val en = Seq.tabulate(10)(i => (i.toLong, "en", "alpha beta gamma delta"))
    val deLike = (100L, "de", "alpha beta gamma delta") // target-like content
    val deOff = (101L, "de", "uniq1 uniq2 uniq3 uniq4") // off-target content
    val docs = (en :+ deLike :+ deOff).toDF("doc_id", "lang", "text")
    val got = TextOps.dsirSample(docs, "en", keep = 100).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getLong(4)))

    val de = got.filter(_._2 == "de").sortBy(_._4)
    assert(de.map(_._1).toSeq === Seq(100L, 101L),
      "the target-like de doc must rank above the off-target one")
    // exact fixed-point values: deLike's bigrams occur 11× in raw,
    // 10× in target → q1 = 11·2^30 div 12 per feature; deOff's occur
    // once, never in target → q1 = 2^30 div 2 (the smoothing floor)
    assert(math.abs(de(0)._3 - 11.0 / 12.0) < 1e-9)
    assert(de(1)._3 === 0.5)

    // identical en docs tie exactly; ranks stay dense by doc_id
    val enRows = got.filter(_._2 == "en").sortBy(_._4)
    assert(enRows.map(_._1).toSeq === (0L until 10L))
    assert(enRows.map(_._3).distinct.length === 1)
  }
}
