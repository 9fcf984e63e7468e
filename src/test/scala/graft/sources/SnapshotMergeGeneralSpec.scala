package graft.sources

import graft.SparkSpec
import graft.operators.ScaleOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** General SQL MERGE shapes on snapshot-catalog tables: clause
  * conditions, WHEN MATCHED DELETE, PARTIAL SET lists (updating only
  * the named columns — the round-12 silent-full-row-replace
  * regression), clause order, CDC envelope replay, copy-on-write
  * file carry, and the remaining loud refusals. */
class SnapshotMergeGeneralSpec extends SparkSpec {
  import spark.implicits._

  private val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"),
    "graft_mrg_spec").toString
  spark.conf.set("spark.sql.catalog.gmrg",
    classOf[SnapshotCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmrg.warehouse", wh)

  private def fs = new Path(wh)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def root(t: String) = new Path(wh, t).toString

  private def seed(t: String, n: Long = 100L): Unit = {
    fs.delete(new Path(root(t)), true)
    spark.sql(s"CREATE TABLE gmrg.$t (id BIGINT, s STRING, q BIGINT) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    (0L until n).map(i => (i, s"old$i", i % 10)).toDF("id", "s", "q")
      .repartitionByRange(4, col("id"))
      .writeTo(s"gmrg.$t").append()
  }

  test("partial SET updates ONLY the assigned columns (regression: was a full-row replace)") {
    seed("p1")
    Seq((5L, "new5", 999L), (200L, "ins200", 7L))
      .toDF("id", "s", "q").createOrReplaceTempView("p1_src")
    spark.sql("""MERGE INTO gmrg.p1 AS t USING p1_src AS u
                |ON t.id = u.id
                |WHEN MATCHED THEN UPDATE SET s = u.s
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql("SELECT id, s, q FROM gmrg.p1")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows.size === 101)
    // the assigned column changed, the UNASSIGNED one kept the
    // TARGET's value (5 % 10 = 5, not the source's 999)
    assert(rows(5L) === ("new5", 5L))
    assert(rows(200L) === ("ins200", 7L))
    assert(rows(6L) === ("old6", 6L))
  }

  test("CDC envelope: conditional DELETE / partial UPDATE / conditional INSERT in one statement") {
    seed("p2")
    Seq(
      (3L, "delete", null.asInstanceOf[String], 0L),
      (7L, "update", "upd7", 0L),
      (300L, "insert", "ins300", 42L),
      (301L, "delete", null.asInstanceOf[String], 0L) // unmatched delete: no-op
    ).toDF("id", "op", "s", "q").createOrReplaceTempView("p2_src")
    spark.sql("""MERGE INTO gmrg.p2 AS t USING p2_src AS u
                |ON t.id = u.id
                |WHEN MATCHED AND u.op = 'delete' THEN DELETE
                |WHEN MATCHED THEN UPDATE SET s = u.s
                |WHEN NOT MATCHED AND u.op != 'delete'
                |  THEN INSERT (id, s, q) VALUES (u.id, u.s, u.q)""".stripMargin)
    val rows = spark.sql("SELECT id, s, q FROM gmrg.p2")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows.size === 100) // 100 - 1 deleted + 1 inserted
    assert(!rows.contains(3L), "matched delete did not drop the row")
    assert(!rows.contains(301L), "unmatched delete-op row was inserted")
    assert(rows(7L) === ("upd7", 7L), "partial update wrong")
    assert(rows(300L) === ("ins300", 42L), "conditional insert missing")
    assert(rows(8L) === ("old8", 8L), "ride-along row disturbed")
    // copy-on-write: the touched keys cluster into few of the 4
    // files; provably-untouched files carry forward by path
    val v2 = ScaleOps.manifestFiles(spark, root("p2"), 2L).toSet
    val v3 = ScaleOps.manifestFiles(spark, root("p2"), 3L).toSet
    assert(v2.intersect(v3).nonEmpty, "general MERGE rewrote every file")
    // change feed: delete preimage for id 3 and 7; insert postimage
    // for 7 and 300
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root("p2"), 2L, 3L)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq === Seq(3L, 7L))
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq === Seq(7L, 300L))
    // snapshot isolation: the pre-merge version is intact
    assert(ScaleOps.readSnapshot(spark, root("p2"), Some(2L)).count() === 100L)
  }

  test("clause order: the FIRST matching clause wins") {
    seed("p3", 20L)
    Seq((4L, "x"), (5L, "y")).toDF("id", "tag")
      .createOrReplaceTempView("p3_src")
    spark.sql("""MERGE INTO gmrg.p3 AS t USING p3_src AS u
                |ON t.id = u.id
                |WHEN MATCHED AND u.tag = 'x' THEN UPDATE SET s = 'first'
                |WHEN MATCHED THEN UPDATE SET s = 'second'""".stripMargin)
    val rows = spark.sql("SELECT id, s FROM gmrg.p3")
      .as[(Long, String)].collect().toMap
    assert(rows(4L) === "first")
    assert(rows(5L) === "second")
    assert(rows(6L) === "old6")
  }

  test("update-only and insert-only merges work; NULL clause conditions keep/drop per the WHERE contract") {
    seed("p4", 10L)
    Seq((2L, null.asInstanceOf[String]), (100L, null.asInstanceOf[String]))
      .toDF("id", "tag").createOrReplaceTempView("p4_src")
    // tag = 'x' is NULL for both rows → neither clause fires: the
    // matched row rides along, the unmatched row is NOT inserted
    spark.sql("""MERGE INTO gmrg.p4 AS t USING p4_src AS u
                |ON t.id = u.id
                |WHEN MATCHED AND u.tag = 'x' THEN UPDATE SET s = 'no'
                |WHEN NOT MATCHED AND u.tag = 'x' THEN
                |  INSERT (id, s, q) VALUES (u.id, 'no', 0)""".stripMargin)
    val rows = spark.sql("SELECT id, s FROM gmrg.p4")
      .as[(Long, String)].collect().toMap
    assert(rows.size === 10 && rows(2L) === "old2")
    // insert-only merge: unassigned INSERT columns null-fill
    spark.sql("""MERGE INTO gmrg.p4 AS t USING p4_src AS u
                |ON t.id = u.id
                |WHEN NOT MATCHED THEN INSERT (id) VALUES (u.id)""".stripMargin)
    val got = spark.sql("SELECT id, s, q FROM gmrg.p4 WHERE id = 100")
      .as[(Long, Option[String], Option[Long])].collect()
    assert(got.toSeq === Seq((100L, None, None)))
  }

  test("DELETE with a non-pushable WHERE executes row-level; pushable conjuncts still bound the rewrite") {
    seed("p6", 400L)
    // length(s) has no data-source Filter translation — round 12
    // refused this statement outright; now the row-level Column
    // drives a correct copy-on-write delete
    spark.sql("DELETE FROM gmrg.p6 WHERE length(s) > 5")
    // 'old100'..'old399' have length 6 → 300 deleted
    assert(spark.sql("SELECT count(*) FROM gmrg.p6").as[Long].head() === 100L)
    assert(ScaleOps.snapshotVersions(spark, root("p6")) === Seq(1L, 2L, 3L))
    // the pushable conjunct still bounds the rewrite set: an id-range
    // AND a non-pushable predicate must carry the out-of-range files
    // forward by path
    seed("p7", 400L)
    spark.sql(
      "DELETE FROM gmrg.p7 WHERE id BETWEEN 0 AND 80 AND length(s) > 4")
    assert(spark.sql("SELECT count(*) FROM gmrg.p7").as[Long].head() ===
      400L - (10L to 80L).size)
    val v2 = ScaleOps.manifestFiles(spark, root("p7"), 2L).toSet
    val v3 = ScaleOps.manifestFiles(spark, root("p7"), 3L).toSet
    assert(v2.intersect(v3).size >= 2,
      "pushable conjunct did not bound the DELETE rewrite set")
  }

  test("UPDATE with a non-pushable WHERE executes row-level; pushable conjuncts still prune") {
    seed("p8", 400L)
    spark.sql("UPDATE gmrg.p8 SET q = -1 " +
      "WHERE id BETWEEN 100 AND 150 AND length(s) = 6")
    val rows = spark.sql("SELECT id, q FROM gmrg.p8")
      .as[(Long, Long)].collect().toMap
    (0L until 400L).foreach { id =>
      if (id >= 100 && id <= 150) assert(rows(id) === -1L, s"row $id missed")
      else assert(rows(id) === id % 10, s"row $id disturbed")
    }
    val v2 = ScaleOps.manifestFiles(spark, root("p8"), 2L).toSet
    val v3 = ScaleOps.manifestFiles(spark, root("p8"), 3L).toSet
    assert(v2.intersect(v3).size >= 2,
      "pushable conjunct did not bound the UPDATE rewrite set")
  }

  test("s23 answers the mixed-envelope merge exactly (relational replay parity)") {
    val d = "/root/testdata/sf0.001"
    val got = ScaleOps.s23MergeGeneral(spark, d)
      .as[(String, String, Long, Long)].collect().toSeq
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    val mx = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .as[Long].head()
    import org.apache.spark.sql.functions.{when => sqlWhen, lit, pmod, count, sum}
    val surv = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
      .select(col("source"),
        sqlWhen(pmod(col("doc_id"), lit(89L)) === 0L, lit("xx"))
          .otherwise(col("lang")).as("lang"),
        col("n_chars"))
    val ins = docs.filter(col("doc_id") < mx / 20)
      .select(lit("merged").as("source"), lit("zz").as("lang"),
        col("n_chars"))
    val want = surv.unionByName(ins)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("source"), col("lang"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("NOT MATCHED BY SOURCE: conditional UPDATE and DELETE over target-only rows") {
    seed("p9", 20L)
    Seq((4L, "x"), (100L, "y")).toDF("id", "tag")
      .createOrReplaceTempView("p9_src")
    spark.sql("""MERGE INTO gmrg.p9 AS t USING p9_src AS u
                |ON t.id = u.id
                |WHEN MATCHED THEN UPDATE SET s = 'hit'
                |WHEN NOT MATCHED THEN INSERT (id, s, q) VALUES (u.id, 'ins', 0)
                |WHEN NOT MATCHED BY SOURCE AND t.q >= 8 THEN DELETE
                |WHEN NOT MATCHED BY SOURCE AND t.q >= 6
                |  THEN UPDATE SET s = 'stale'""".stripMargin)
    val rows = spark.sql("SELECT id, s FROM gmrg.p9")
      .as[(Long, String)].collect().toMap
    // matched: id 4 updated; unmatched source: id 100 inserted
    assert(rows(4L) === "hit" && rows(100L) === "ins")
    // target-only rows: q in {8,9} deleted, q in {6,7} re-tagged,
    // the rest ride along — clause order and conditions respected
    (0L until 20L).filterNot(_ == 4L).foreach { id =>
      val q = id % 10
      if (q >= 8) assert(!rows.contains(id), s"row $id not deleted")
      else if (q >= 6) assert(rows(id) === "stale", s"row $id not updated")
      else assert(rows(id) === s"old$id", s"row $id disturbed")
    }
    // the change feed decomposes the sync correctly: deletes carry
    // the q>=8 preimages plus the updated rows' preimages
    val feed = ScaleOps.readSnapshotChangeFeed(spark, root("p9"), 2L, 3L)
    val delIds = feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq
    assert(delIds === (0L until 20L).filter(i =>
      i == 4L || (i % 10 >= 6 && i != 4L)).sorted)
  }

  test("general merge picks MoR on a narrow envelope: fired rows DV out, only post-images append") {
    def mk(t: String): String = {
      fs.delete(new Path(root(t)), true)
      spark.sql(s"CREATE TABLE gmrg.$t (id BIGINT, s STRING, q BIGINT) " +
        "TBLPROPERTIES ('statscol' = 'id')")
      (0L until 1000L).map(i => (i, s"r$i", i % 10)).toDF("id", "s", "q")
        .repartitionByRange(10, col("id"))
        .writeTo(s"gmrg.$t").append()
      root(t)
    }
    val morRoot = mk("pm1")
    val cowRoot = mk("pm2")
    Seq((500L, "delete", null.asInstanceOf[String]),
      (501L, "update", "upd501"), (5000L, "insert", "ins5000"))
      .toDF("id", "op", "s").createOrReplaceTempView("pm_src")
    def run(t: String): Unit = spark.sql(
      s"""MERGE INTO gmrg.$t AS t USING pm_src AS u
         |ON t.id = u.id
         |WHEN MATCHED AND u.op = 'delete' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET s = u.s
         |WHEN NOT MATCHED AND u.op = 'insert'
         |  THEN INSERT (id, s, q) VALUES (u.id, u.s, -1)""".stripMargin)
    // 3 keys in 1 of 10 files: auto picks MoR — every parent file
    // carries forward, the envelope writes only its post-images
    run("pm1")
    val v2f = ScaleOps.manifestFiles(spark, morRoot, 3L).toSet
    assert(ScaleOps.manifestFiles(spark, morRoot, 2L).toSet
      .subsetOf(v2f), "general MoR merge rewrote a carried file")
    assert(ScaleOps.snapshotHasDvs(spark, morRoot, 3L))
    // the CoW twin (threshold 0 forces the rewrite) agrees row-for-row
    spark.conf.set("spark.graft.snapshot.morMaxTouchedFraction", "0.0")
    try run("pm2")
    finally spark.conf.unset("spark.graft.snapshot.morMaxTouchedFraction")
    assert(!ScaleOps.snapshotHasDvs(spark, cowRoot, 3L))
    def rows(r: String) = ScaleOps.readSnapshot(spark, r)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(rows(morRoot) === rows(cowRoot))
    assert(rows(morRoot).size === 1000) // -1 deleted, +1 inserted
    assert(!rows(morRoot).exists(_._1 == 500L))
    assert(rows(morRoot).find(_._1 == 501L).get._2 === "upd501")
  }

  test("round-14: composite two-column MERGE keys (SQL general + canonical + API)") {
    // a composite-keyed table: (grp, id) identifies a row
    fs.delete(new Path(root("ck1")), true)
    spark.sql("CREATE TABLE gmrg.ck1 (grp BIGINT, id BIGINT, s STRING) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    (0L until 100L).map(i => (i % 4, i, s"old$i")).toDF("grp", "id", "s")
      .repartitionByRange(4, col("id")).writeTo("gmrg.ck1").append()
    Seq((1L, 5L, "upd5"), (0L, 5L, "upd5g0"), (2L, 500L, "ins500"))
      .toDF("grp", "id", "s").createOrReplaceTempView("ck1_src")
    // GENERAL shape (partial SET) on the two-column key: only the
    // (grp, id) pairs named update — id=5 belongs to grp 1, so the
    // (0, 5) source row matches nothing and inserts nothing (no
    // NOT MATCHED clause fires for it under the condition)
    spark.sql("""MERGE INTO gmrg.ck1 AS t USING ck1_src AS u
                |ON t.grp = u.grp AND t.id = u.id
                |WHEN MATCHED THEN UPDATE SET s = u.s
                |WHEN NOT MATCHED AND u.id >= 100 THEN INSERT *""".stripMargin)
    val rows = spark.sql("SELECT grp, id, s FROM gmrg.ck1")
      .as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rows.size === 101)
    assert(rows((1L, 5L)) === "upd5")
    assert(rows((2L, 500L)) === "ins500")
    assert(rows((2L, 6L)) === "old6")
    assert(!rows.contains((0L, 5L)))
    // CANONICAL composite upsert (UPDATE SET * / INSERT *) routes to
    // the upsert executor — unique-key check is over the PAIR
    Seq((1L, 9L, "upd9"), (3L, 9L, "dup-but-distinct-pair"))
      .toDF("grp", "id", "s").createOrReplaceTempView("ck1_src2")
    spark.sql("""MERGE INTO gmrg.ck1 AS t USING ck1_src2 AS u
                |ON t.grp = u.grp AND t.id = u.id
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows2 = spark.sql("SELECT grp, id, s FROM gmrg.ck1")
      .as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rows2((1L, 9L)) === "upd9")
    assert(rows2((3L, 9L)) === "dup-but-distinct-pair")
    // the API face takes the same composite key comma-separated
    ScaleOps.mergeIntoSnapshot(spark, root("ck1"), "grp,id",
      Seq((2L, 6L, "api6")).toDF("grp", "id", "s"))
    assert(ScaleOps.readSnapshot(spark, root("ck1"))
      .filter(col("grp") === 2L && col("id") === 6L)
      .select("s").as[String].head() === "api6")
  }

  test("round-14: RENAMED merge keys (ON t.id = s.doc) route by the pair") {
    seed("rk1", 20L)
    Seq((5L, "upd5"), (200L, "ins200"))
      .toDF("doc", "v").createOrReplaceTempView("rk1_src")
    spark.sql("""MERGE INTO gmrg.rk1 AS t USING rk1_src AS u
                |ON t.id = u.doc
                |WHEN MATCHED THEN UPDATE SET s = u.v
                |WHEN NOT MATCHED THEN INSERT (id, s, q) VALUES (u.doc, u.v, 0)""".stripMargin)
    val rows = spark.sql("SELECT id, s FROM gmrg.rk1")
      .as[(Long, String)].collect().toMap
    assert(rows.size === 21)
    assert(rows(5L) === "upd5" && rows(200L) === "ins200")
    assert(rows(6L) === "old6")
  }

  test("round-14: schema evolution on a GENERAL (conditional-star) merge") {
    seed("ev1", 20L)
    Seq((5L, "upd5", 1L, "extra5"), (200L, "ins200", 2L, "extra200"),
      (7L, "skip7", 1L, "extra7"))
      .toDF("id", "s", "q", "note").createOrReplaceTempView("ev1_src")
    // the clause CONDITION makes this a general shape; WITH SCHEMA
    // EVOLUTION admits the source's new `note` column
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gmrg.ev1 AS t
                |USING ev1_src AS u
                |ON t.id = u.id
                |WHEN MATCHED AND u.s != 'skip7' THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.sql("SELECT id, s, q, note FROM gmrg.ev1")
      .as[(Long, String, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rows.size === 21)
    // updated row carries the evolved column
    assert(rows(5L) === (("upd5", 1L, Some("extra5"))))
    // inserted row too
    assert(rows(200L) === (("ins200", 2L, Some("extra200"))))
    // conditioned-out row kept its old image, note null-fills
    assert(rows(7L) === (("old7", 7L, None)))
    // untouched rows null-fill the evolved column
    assert(rows(3L) === (("old3", 3L, None)))
  }

  test("round-14: DML through a stale/pinned relation refuses loudly") {
    seed("pin1", 10L)
    val r = root("pin1")
    val head = ScaleOps.snapshotVersions(spark, r).last
    val cmd = graft.plans.DeleteSnapshotCommand(r, head - 1L, None, None)
    val e = intercept[Exception](cmd.run(spark))
    assert(e.getMessage.contains(s"pinned to v${head - 1}"))
    val cmd2 = graft.plans.UpdateSnapshotCommand(r, head - 1L, None,
      Nil, None)
    val e2 = intercept[Exception](cmd2.run(spark))
    assert(e2.getMessage.contains("time-travel pin"))
  }

  test("round-14 pin: SQL MERGE whose SOURCE carries deletion vectors") {
    seed("dvs1", 50L)
    // source table: ids 0..29, then MoR-delete 0..9
    fs.delete(new Path(root("dvs1s")), true)
    spark.sql("CREATE TABLE gmrg.dvs1s (id BIGINT, s STRING, q BIGINT) " +
      "TBLPROPERTIES ('statscol' = 'id')")
    (0L until 30L).map(i => (i, s"src$i", 0L)).toDF("id", "s", "q")
      .repartitionByRange(3, col("id")).writeTo("gmrg.dvs1s").append()
    ScaleOps.deleteWhereSnapshot(spark, root("dvs1s"), col("id") < 10L,
      Seq(ScaleOps.ColConstraint("id", None, Some(9L), None)), mode = "mor")
    assert(ScaleOps.snapshotHasDvs(spark, root("dvs1s"),
      ScaleOps.snapshotVersions(spark, root("dvs1s")).last))
    spark.sql("""MERGE INTO gmrg.dvs1 AS t USING gmrg.dvs1s AS u
                |ON t.id = u.id
                |WHEN MATCHED THEN UPDATE SET s = u.s""".stripMargin)
    val rows = spark.sql("SELECT id, s FROM gmrg.dvs1")
      .as[(Long, String)].collect().toMap
    // the source's deleted rows 0..9 must NOT have matched: their
    // target rows keep the old image (resurrection = the rule losing
    // to the command's inner re-analysis)
    (0L until 10L).foreach(i => assert(rows(i) === s"old$i",
      s"DV'd source row $i resurrected into the MERGE"))
    (10L until 30L).foreach(i => assert(rows(i) === s"src$i"))
    (30L until 50L).foreach(i => assert(rows(i) === s"old$i"))
  }

  test("unsupported general shapes refuse loudly") {
    seed("p5", 10L)
    Seq((1L, "a")).toDF("id", "s").createOrReplaceTempView("p5_src")
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO gmrg.p5 AS t USING p5_src AS u
                  |ON t.id = u.id AND t.q > 0
                  |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("conjunction of equi-joins"))
    // duplicate source keys refuse (cardinality), not last-wins
    Seq((1L, "a"), (1L, "b")).toDF("id", "s")
      .createOrReplaceTempView("p5_dup")
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO gmrg.p5 AS t USING p5_dup AS u
                  |ON t.id = u.id
                  |WHEN MATCHED THEN UPDATE SET s = u.s""".stripMargin)
    }
    assert(e2.getMessage.contains("unique"))
  }
}
