package graft

import java.sql.Timestamp

import graft.streaming.{EventRow, Jobs, Sources, StatefulOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5 #3): algebraic invariants that must
  * hold for ANY input, checked over ScalaCheck-generated data with
  * deterministic seeds (the scalatest/scalacheck bridge is not on the
  * offline classpath, so sampling is explicit). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples of a generator, seeds 1..n. */
  private def forAllSamples[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def minSuccessful(n: Int): Int = n // kept for call-site clarity

  private def forAll[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    forAllSamples(g, n)(body)

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val genEvent: Gen[EventRow] = for {
    id <- Gen.choose(1L, 10000L)
    sec <- Gen.choose(0L, 120L)
    user <- Gen.choose(1L, 8L)
    typ <- Gen.oneOf("view", "click", "purchase", "signup", "error")
    value <- Gen.choose(0, 10000).map(_ / 100.0)
  } yield EventRow(id, new Timestamp(1704067200000L + sec * 1000), user, typ, value, "{}")

  private val genEvents: Gen[List[EventRow]] =
    Gen.listOfN(40, genEvent).map(_.distinctBy(_.event_id))

  test("windowed reduce is lossless: window sums add up to the total") {
    forAll(genEvents, minSuccessful(10)) { evs =>
      whenever(evs.nonEmpty) {
        val df = spark.createDataset(evs).toDF()
        val windowed = df
          .groupBy(window($"ts", "10 seconds"))
          .agg(count(lit(1)).as("ct"), sum($"value").as("v"))
          .agg(sum($"ct"), sum($"v")).as[(Long, Double)].head()
        val direct = df.agg(count(lit(1)), sum($"value")).as[(Long, Double)].head()
        assert(windowed._1 === direct._1)
        assert(math.abs(windowed._2 - direct._2) < 1e-6)
      }
    }
  }

  test("salted aggregation equals direct aggregation for any input") {
    forAll(genEvents, minSuccessful(10)) { evs =>
      whenever(evs.nonEmpty) {
        val df = spark.createDataset(evs).toDF()
        val direct = df.groupBy($"user_id")
          .agg(count(lit(1)).as("ct"), countDistinct($"event_type").as("ty"))
          .as[(Long, Long, Long)].collect().toSet
        val salted = operators.ScaleOps.saltedAgg(
          df, $"user_id", $"event_id", salts = 4,
          aggs = Seq(
            ("ct", count(lit(1)), (p: org.apache.spark.sql.Column) => sum(p)),
            ("ty", collect_set($"event_type"),
              (p: org.apache.spark.sql.Column) =>
                size(array_distinct(flatten(collect_list(p)))).cast("long"))))
          .as[(Long, Long, Long)].collect().toSet
        assert(salted === direct)
      }
    }
  }

  test("bounce detector: every input event yields at most one hit, " +
    "entries only, and reasons are consistent with gaps") {
    forAll(genEvents, minSuccessful(10)) { evs =>
      val ds = spark.createDataset(evs)
      val hits = StatefulOps.detectBounce(spark, ds).collect()
      val byId = evs.map(e => e.event_id -> e).toMap
      assert(hits.map(_.event_id).distinct.length === hits.length)
      assert(hits.forall(h => byId(h.event_id).event_type == "view"))
    }
  }

  test("daily-first-visit emits exactly one row per (user, day) with views") {
    forAll(genEvents, minSuccessful(10)) { evs =>
      val ds = spark.createDataset(evs)
      val got = StatefulOps.dailyFirstVisit(spark, ds, ttl = None).collect()
      val expectKeys = evs.filter(_.event_type == "view")
        .map(e => (e.user_id, e.ts.getTime / 86400000L)).toSet
      assert(got.map(u => (u.user_id, u.dt)).distinct.length === got.length)
      assert(got.length === expectKeys.size)
    }
  }

  test("log split partitions the input: start ∪ page exhaustive and disjoint") {
    val genLine: Gen[String] = for {
      mid <- Gen.choose(1, 5).map("mid_" + _)
      isStart <- Gen.oneOf(true, false)
      nDisp <- Gen.choose(0, 3)
      ts <- Gen.choose(0L, 1000L)
    } yield {
      val displays =
        if (isStart || nDisp == 0) ""
        else
          s""","displays":[${(1 to nDisp).map(i =>
            s"""{"display_type":"t","item":"s$i","item_type":"sku_id","order":$i}""")
            .mkString(",")}]"""
      val body =
        if (isStart) s""""start":{"entry":"icon"}"""
        else s""""page":{"page_id":"home","last_page_id":"","during_time":1}"""
      s"""{"common":{"mid":"$mid"},$body$displays,"ts":$ts}"""
    }
    forAll(Gen.listOfN(30, genLine), minSuccessful(10)) { lines =>
      val parsed = spark.read.schema(Sources.logSchema)
        .json(spark.createDataset(lines))
      val (start, page, displays) = Jobs.splitLog(parsed)
      assert(start.count() + page.count() === parsed.count())
      assert(start.filter($"start".isNull).count() === 0L)
      assert(page.filter($"start".isNotNull).count() === 0L)
      // display fan-out cardinality = Σ|displays| over page rows
      val expected = parsed.filter($"start".isNull)
        .select(coalesce(size($"displays"), lit(0)).as("n"))
        .agg(sum($"n")).as[Long].head()
      assert(displays.count() === expected)
    }
  }
}
