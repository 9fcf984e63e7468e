package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Concurrent writers racing for the same version slot: exactly one
  * commit wins, the loser detects the race, cleans only its own
  * debris, and a retry lands on the next slot — no row lost, no
  * orphan visible to readers, for append×append and append×merge. */
class SnapshotRaceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_race_$tag").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  /** Run both thunks as simultaneously as a latch can make them;
    * each retries on a lost commit race (the documented client
    * contract: the operation recomputes the next slot). Returns the
    * per-writer committed versions. */
  private def race(a: () => Long, b: () => Long): (Long, Long) = {
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def contend(op: () => Long): java.util.concurrent.Future[Long] =
      pool.submit { () =>
        gate.await()
        var committed = -1L
        var attempts = 0
        while (committed < 0) {
          attempts += 1
          require(attempts <= 10, "race retry runaway")
          try committed = op()
          catch { case e: IllegalStateException
            if e.getMessage.contains("lost the commit race") => () }
        }
        committed
      }
    val fa = contend(a); val fb = contend(b)
    gate.countDown()
    try (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    finally pool.shutdown()
  }

  test("append × append: one winner per slot, retry lands the loser, no rows lost") {
    val root = freshDir("aa")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root, docs((1L, "en", "base")))
    val (va, vb) = race(
      () => ScaleOps.appendSnapshot(spark, root, docs((2L, "de", "batch a"))),
      () => ScaleOps.appendSnapshot(spark, root, docs((3L, "fr", "batch b"))))
    // both landed, on distinct slots, with no gap
    assert(Set(va, vb) === Set(2L, 3L))
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L, 2L, 3L))
    val ids = ScaleOps.readSnapshot(spark, root)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
    // the loser's first attempt left nothing a reader can see, and
    // every manifest-listed file exists (no clobbered winner)
    val listed = (1L to 3L)
      .flatMap(v => ScaleOps.readSnapshot(spark, root, Some(v)).inputFiles)
    listed.foreach(f => assert(fs(root).exists(new Path(f)), s"missing $f"))
  }

  test("append × merge: both land under contention with merge semantics intact") {
    // a handful of iterations: the lost-update hazard (merge plans vs
    // v1, append commits v2, merge wins v3 carrying only v1's lines)
    // is timing-dependent — conflict detection must hold every time
    for (iter <- 1 to 3) {
    val root = freshDir(s"am$iter")
    fs(root).delete(new Path(root), true)
    ScaleOps.publishSnapshot(spark, root,
      docs((1L, "en", "one"), (2L, "de", "zwei"))
        .repartitionByRange(2, col("doc_id")),
      statsCol = Some("doc_id"))
    val (va, vb) = race(
      () => ScaleOps.appendSnapshot(spark, root, docs((5L, "fr", "cinq")),
        statsCol = Some("doc_id")),
      () => ScaleOps.mergeIntoSnapshot(spark, root, "doc_id",
        docs((2L, "de", "zwei neu"), (9L, "zh", "jiu"))))
    assert(Set(va, vb) === Set(2L, 3L))
    assert(ScaleOps.snapshotVersions(spark, root) === Seq(1L, 2L, 3L))
    // final content: base + append + merge (update applied, insert in)
    val rows = ScaleOps.readSnapshot(spark, root)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rows === Map(1L -> "one", 2L -> "zwei neu",
      5L -> "cinq", 9L -> "jiu"))
    // version lineage is consistent whichever order won
    (1L to 3L).foreach { v =>
      val n = ScaleOps.readSnapshot(spark, root, Some(v)).count()
      assert(n >= 2, s"v$v readable")
    }
    }
  }
}
