package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset

/** The stateful trio under the RocksDB state store provider — the
  * 100×-scale state story: HDFSBackedStateStore holds every key in
  * executor heap, RocksDB spills keyed state to local disk, so a
  * 10^9-device is_new map survives. This suite pins that the three
  * operators behave IDENTICALLY under both providers (same fixtures,
  * same hand-computed expectations as StatefulOpsSpec).
  */
class RocksDbStateSpec extends SparkSpec with StreamRunner {
  import Fixtures._
  import spark.implicits._

  private val key = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private var prev: Option[String] = None

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    prev = spark.conf.getOption(key)
    spark.conf.set(key, rocks)
  }

  override def afterAll(): Unit = {
    prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    super.afterAll()
  }

  test("bounce under RocksDB: split delivery across micro-batches") {
    val (b1, b2) = bounceEvents.sortBy(_.ts.getTime).splitAt(4)
    val sentinel = ev(999, 7300, 99, "click")
    val got = runStream(Seq(b1, b2, Seq(sentinel))) { ds: Dataset[EventRow] =>
      StatefulOps.detectBounce(spark, ds.withWatermark("ts", "1 hour"))
    }
    assert(got.map(h => h.event_id -> h.reason).toMap === expectedBounceIds)
  }

  test("is_new repair under RocksDB: streaming across micro-batches") {
    val got = runStream(isNewEvents.grouped(2).toSeq) { ds: Dataset[EventRow] =>
      StatefulOps.repairIsNew(spark, ds)
    }
    assert(got.map(r => r.event_id -> r.is_new).toMap === expectedIsNew)
  }

  test("daily-first-visit under RocksDB: streaming across micro-batches") {
    val got = runStream(uvEvents.grouped(2).toSeq) { ds: Dataset[EventRow] =>
      StatefulOps.dailyFirstVisit(spark, ds, ttl = None)
    }
    assert(got.map(_.event_id).toSet === expectedUvIds)
  }

  test("the RocksDB provider is actually in effect") {
    assert(spark.conf.get(key) === rocks)
  }
}
