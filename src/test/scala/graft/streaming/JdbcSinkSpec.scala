package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** A13/A27 JDBC twins against in-process Derby (embedded driver, on
  * the Spark classpath): stats written through the streaming JDBC
  * sink read back for a B-query; dim upsert MERGE semantics
  * (insert + update + last-writer-wins within a batch). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("stats through the streaming JDBC sink, read back for a B-query") {
    val root = java.nio.file.Files.createTempDirectory("jdbcstats").toString
    // product-stats-shaped rows, with a transient accumulator column
    // that must NOT reach the warehouse (@TransientSink).
    val stats = Seq(
      ("2024-01-01 00:00:00", "2024-01-01 00:00:10", 1L, 10.50, "a,b"),
      ("2024-01-01 00:00:00", "2024-01-01 00:00:10", 2L, 5.25, "c"),
      ("2024-01-01 00:00:10", "2024-01-01 00:00:20", 1L, 4.25, "d"))
      .toDF("stt", "edt", "sku_id", "order_amount", "order_id_set")
    stats.coalesce(1).write.mode("overwrite").json(s"$root/in")

    val stream = spark.readStream.schema(stats.schema).json(s"$root/in")
    val q = Sinks.statsJdbcSink(stream, url, "product_stats",
      s"$root/ckpt", transientCols = Seq("order_id_set"), batchSize = 2)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))

    val back = spark.read.jdbc(url, "product_stats", new java.util.Properties)
    assert(back.columns.toSeq.map(_.toLowerCase).sorted ===
      Seq("edt", "order_amount", "sku_id", "stt")) // transient col skipped
    // B1-style GMV from the JDBC warehouse
    val gmv = back.agg(sum($"order_amount")).as[Double].collect().head
    assert(math.abs(gmv - 20.0) < 1e-9)
    // and a top-sku ranking (B2 shape) survives the round-trip
    val top = back.groupBy($"sku_id").agg(sum($"order_amount").as("amt"))
      .orderBy($"amt".desc).select($"sku_id").as[Long].collect()
    assert(top.head === 1L)
  }

  test("dim upsert via MERGE: insert, update, last-writer-wins") {
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE dim_user (user_id BIGINT PRIMARY KEY, user_name VARCHAR(64), ver BIGINT)")
    conn.close()

    val batch1 = Seq((1L, "alice", 1L), (2L, "bob", 1L))
      .toDF("user_id", "user_name", "ver")
    Sinks.upsertDimJdbc(batch1, url, "dim_user", "user_id", "ver")

    // update user 1, insert user 3; user 1 also carries a STALE row in
    // the same batch (ver 1) that must lose to ver 3.
    val batch2 = Seq((1L, "alice2", 3L), (1L, "stale", 1L), (3L, "carol", 2L))
      .toDF("user_id", "user_name", "ver")
    Sinks.upsertDimJdbc(batch2, url, "dim_user", "user_id", "ver")

    val dims = spark.read.jdbc(url, "dim_user", new java.util.Properties)
      .select($"user_id", $"user_name").as[(Long, String)].collect().toMap
    assert(dims === Map(1L -> "alice2", 2L -> "bob", 3L -> "carol"))
  }

  test("exactly-once stats write: replayed batch is a no-op, new batch appends") {
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE stats_eo (k BIGINT, v VARCHAR(32))")
    conn.close()

    val b = Seq((1L, Some("a")), (2L, Some("b")), (3L, Option.empty[String]))
      .toDF("k", "v").repartition(2)
    def count(): Long =
      spark.read.jdbc(url, "stats_eo", new java.util.Properties).count()

    Sinks.writeStatsJdbcExactlyOnce(b, 7L, "q1", url, "stats_eo", Nil)
    assert(count() === 3)
    // checkpoint-recovery replay of the SAME (query, batch): no dup
    Sinks.writeStatsJdbcExactlyOnce(b, 7L, "q1", url, "stats_eo", Nil)
    assert(count() === 3)
    // the next batch id appends
    Sinks.writeStatsJdbcExactlyOnce(b, 8L, "q1", url, "stats_eo", Nil)
    assert(count() === 6)
    // a different query name is an independent marker namespace
    Sinks.writeStatsJdbcExactlyOnce(b, 7L, "q2", url, "stats_eo", Nil)
    assert(count() === 9)
  }

  test("dim upsert binds null columns with typed setNull (Derby rejects untyped)") {
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE dim_nullable (id BIGINT PRIMARY KEY, label VARCHAR(64), score DOUBLE, ver BIGINT)")
    conn.close()

    // null VARCHAR and null DOUBLE on insert, then a null overwriting a
    // non-null on update — both go through the setNull path.
    val b1 = Seq((1L, Some("x"), Some(1.5), 1L), (2L, None, None, 1L))
      .toDF("id", "label", "score", "ver")
    Sinks.upsertDimJdbc(b1, url, "dim_nullable", "id", "ver")
    val b2 = Seq((1L, Option.empty[String], Some(2.5), 2L))
      .toDF("id", "label", "score", "ver")
    Sinks.upsertDimJdbc(b2, url, "dim_nullable", "id", "ver")

    val rows = spark.read.jdbc(url, "dim_nullable", new java.util.Properties)
      .select($"id", $"label", $"score").as[(Long, Option[String], Option[Double])]
      .collect().map { case (k, l, s) => k -> (l, s) }.toMap
    assert(rows(1L) === ((None, Some(2.5))))
    assert(rows(2L) === ((None, None)))
  }
}
