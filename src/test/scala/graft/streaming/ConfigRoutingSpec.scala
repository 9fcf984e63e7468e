package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A11 streaming fidelity: the routing config is re-read per
  * micro-batch, so a config row added MID-STREAM (the reference's
  * broadcast-state update, TableProcessFunction.java:49-67) changes
  * the routing of subsequent batches — and only those; and a new
  * hbase-bound row triggers the CREATE TABLE side-effect mid-stream
  * (:79-126). */
class ConfigRoutingSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    new java.io.File(path).getParentFile.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes)
  }

  private def ev(id: Long, kind: String, user: Long, v: Double) =
    s"""{"event_id":$id,"event_type":"$kind","user_id":$user,"value":$v}"""

  private def cfg(kind: String, typ: String, table: String, cols: String,
      pk: String, ts: Long) =
    s"""{"source_kind":"$kind","sink_type":"$typ","sink_table":"$table","sink_columns":"$cols","sink_pk":"$pk","op_ts":$ts}"""

  test("config row added mid-stream changes routing of later batches only") {
    val root = java.nio.file.Files.createTempDirectory("cfgroute").toString
    val evDir = s"$root/events"
    val cfgDir = s"$root/config"

    // v1 config: click keeps (event_id,user_id,value); view keeps
    // (event_id,value); purchase has NO route yet (dropped).
    writeLines(s"$cfgDir/cdc-0.json", Seq(
      cfg("click", "kafka", "dwd_click", "event_id,user_id,value", "event_id", 1),
      cfg("view", "kafka", "dwd_page", "event_id,value", "event_id", 2)))
    writeLines(s"$evDir/batch-0.json", Seq(
      ev(1, "click", 10, 5.0),
      ev(2, "view", 11, 6.0),
      ev(3, "purchase", 12, 7.0)))

    def runJob(): Unit = {
      val events = spark.readStream.schema(evSchema).json(evDir)
      val q = ConfigRouting.routedJob(events, cfgDir, s"$root/out",
        s"$root/ckpt", "event_type",
        passCols = Seq("event_id", "event_type"),
        candidateCols = Seq("value", "user_id")).start()
      assert(q.awaitTermination(120000))
    }
    runJob()

    val out1 = spark.read.parquet(s"$root/out")
    // purchase had no config row -> dropped; view's user_id masked
    assert(out1.count() === 2L)
    assert(out1.filter($"event_id" === 3).count() === 0L)
    val view1 = out1.filter($"event_id" === 2).collect().head
    assert(view1.getAs[String]("sink_table") === "dwd_page")
    assert(view1.getAs[Any]("user_id") == null)
    assert(view1.getAs[Double]("value") === 6.0)
    assert(out1.filter($"event_id" === 1).collect().head
      .getAs[Long]("user_id") === 10L)

    // ---- mid-stream config change (binlog append): purchase gets a
    // route; view's sink_columns SHRINK to event_id only; plus a new
    // hbase-bound dim row -> DDL must fire on the next batch.
    writeLines(s"$cfgDir/cdc-1.json", Seq(
      cfg("purchase", "clickhouse", "dws_purchase", "event_id,user_id,value", "event_id", 3),
      cfg("view", "kafka", "dwd_page", "event_id", "event_id", 4),
      cfg("signup", "hbase", "dim_cfgspec_user", "user_id,value", "user_id", 5)))
    writeLines(s"$evDir/batch-1.json", Seq(
      ev(4, "purchase", 13, 8.0),
      ev(5, "view", 14, 9.0),
      ev(6, "signup", 15, 0.0)))
    runJob() // same checkpoint: the stream RESUMES, only new files read

    val out2 = spark.read.parquet(s"$root/out")
    assert(out2.count() === 5L)
    // new purchase row routed per the NEW config
    val p = out2.filter($"event_id" === 4).collect().head
    assert(p.getAs[String]("sink_table") === "dws_purchase" &&
      p.getAs[String]("sink_type") === "clickhouse" &&
      p.getAs[Long]("user_id") === 13L)
    // new view row masked per the UPDATED (shrunk) projection …
    val view2 = out2.filter($"event_id" === 5).collect().head
    assert(view2.getAs[Any]("value") == null &&
      view2.getAs[Any]("user_id") == null)
    // … while the batch-0 view row is untouched (routed under v1)
    assert(out2.filter($"event_id" === 2).collect().head
      .getAs[Double]("value") === 6.0)
    // DDL side-effect fired mid-stream for the new hbase row
    assert(spark.catalog.tableExists("dim_cfgspec_user"))
    val ddlCols = spark.table("dim_cfgspec_user").columns.toSeq
    assert(ddlCols === Seq("user_id", "value"))
  }
}
