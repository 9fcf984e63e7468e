package graft.operators

import graft.SparkSpec

/** c13b persisted-signature dedup: value-identical to c13, no
  * rebuild while the corpus token matches, rebuild on token drift.
  */
class SigStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def metaTable: String =
    s"graft_sig_meta_${Integer.toHexString(sf.hashCode)}"

  test("c13b equals c13 row-for-row and reuses the persisted store") {
    val live = DedupOps.c13IncrementalDedup(spark, sf)
    val stored = DedupOps.c13bIncrementalPersisted(spark, sf)
    assert(stored.exceptAll(live).count() === 0L)
    assert(live.exceptAll(stored).count() === 0L)
    // token now current: a second read must NOT rebuild — observe via
    // the meta table's stable token value and catalog presence
    val tok1 = spark.table(metaTable).as[String].collect().head
    DedupOps.c13bIncrementalPersisted(spark, sf).collect()
    val tok2 = spark.table(metaTable).as[String].collect().head
    assert(tok1 === tok2)
  }

  test("a drifted token triggers a rebuild that restores the answers") {
    DedupOps.c13bIncrementalPersisted(spark, sf).collect() // ensure built
    // corrupt the stored token → next read must rebuild, not reuse
    Seq("stale").toDF("token").write.mode("overwrite")
      .format("parquet").saveAsTable(metaTable)
    val live = DedupOps.c13IncrementalDedup(spark, sf)
    val stored = DedupOps.c13bIncrementalPersisted(spark, sf)
    assert(stored.exceptAll(live).count() === 0L)
    assert(live.exceptAll(stored).count() === 0L)
    val tok = spark.table(metaTable).as[String].collect().head
    assert(tok !== "stale") // the rebuild rewrote the token
  }
}
