package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native h60 expression: identical to the md5-hex/conv built-in
  * form over real document text and shingle-style inputs. */
class H60Spec extends SparkSpec {
  import spark.implicits._

  test("native h60 equals the md5/conv form over real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val mismatch = docs
      .select(
        Portable.h60($"text").as("native"),
        Portable.h60Builtin($"text").as("builtin"))
      .filter($"native" =!= $"builtin").count()
    assert(mismatch === 0L)
    // and over short prefixed inputs as MinHash builds them
    val sh = docs.select(explode(split($"text", "\\s+")).as("t"))
      .select(concat(lit("3:"), $"t").as("s"))
    assert(sh.filter(Portable.h60($"s") =!= Portable.h60Builtin($"s")).count() === 0L)
  }

  test("values are 60-bit non-negative and match a known vector") {
    assert(H60.hashString("hello") === 419982666956583591L)
    assert(H60.hashString("") >= 0L)
  }
}
