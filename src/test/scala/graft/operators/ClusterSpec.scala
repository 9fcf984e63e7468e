package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The min-label-propagation components on hand graphs: chains need
  * multiple propagation rounds (the transitive case pair-level dedup
  * misses), stars collapse in one, singleton pairs stay size 2. */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("chain, star, and isolated pair cluster correctly") {
    // chain 1-2-3-4 (diameter 3 → several rounds), star 10-{11,12,13},
    // isolated pair 20-21
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (13L, 10L),
      (20L, 21L))
      .toDF("da", "db")
    val got = DedupOps.connectedComponents(pairs)
      .as[(Long, Long, Long)].collect()
      .map { case (doc, cl, sz) => doc -> ((cl, sz)) }.toMap
    val expected = Map(
      1L -> ((1L, 4L)), 2L -> ((1L, 4L)), 3L -> ((1L, 4L)), 4L -> ((1L, 4L)),
      10L -> ((10L, 4L)), 11L -> ((10L, 4L)), 12L -> ((10L, 4L)), 13L -> ((10L, 4L)),
      20L -> ((20L, 2L)), 21L -> ((20L, 2L)))
    assert(got === expected)
  }

  test("large/small-star matches propagation on hand graphs") {
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (13L, 10L),
      (20L, 21L))
      .toDF("da", "db")
    val star = DedupOps.connectedComponentsStar(pairs)
      .as[(Long, Long, Long)].collect().toSet
    val prop = DedupOps.connectedComponents(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(star === prop)
  }

  test("a 1,000-doc chain converges in a bounded round count with exact labels") {
    // The topology min-label propagation CANNOT absorb: a chain of
    // diameter 999 would need 999 propagation rounds; large/small-star
    // contracts it in O(log^2) alternations. Labels have a closed
    // form (everything joins doc 0), standing in for the
    // recursive-CTE oracle at this scale.
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("da", "db")
    val (out, rounds) = DedupOps.starComponents(chain)
    assert(rounds < 25, s"star contraction took $rounds rounds on a 1,000-chain")
    val got = out.as[(Long, Long, Long)].collect()
    assert(got.length === 1000)
    assert(got.forall { case (_, cl, sz) => cl === 0L && sz === 1000L })
  }

  test("a 50-duplicate hot LSH bucket yields the full pair set and one cluster") {
    // 50 byte-identical boilerplate docs land in the SAME band buckets
    // (identical MinHash signatures) — the worst-case hot bucket the
    // dedup path must absorb: candidate generation stays quadratic
    // only WITHIN the bucket, and clustering collapses it to one
    // canonical doc. 50 distinct docs ride along to prove isolation.
    val boiler = ("click here to subscribe to our newsletter " * 5).trim
    val corpus = (
      (1L to 50L).map(i => (i, boiler)) ++
      (100L to 149L).map(i =>
        (i, s"entirely distinct document number $i about topic ${i * 7}"))
    ).toDF("doc_id", "text")
    val bands = DedupOps.bandKeys(DedupOps.shingleDocsOf(corpus, 3, hashed = true))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
      .as[(Long, Long)].collect().toSet
    val hotPairs = (for (a <- 1L to 50L; b <- (a + 1) to 50L) yield (a, b)).toSet
    assert(hotPairs.subsetOf(cand), "hot-bucket pair set is incomplete")
    val comps = DedupOps.connectedComponents(
      cand.toSeq.toDF("da", "db"))
      .as[(Long, Long, Long)].collect()
    val hot = comps.filter(_._1 <= 50L)
    assert(hot.length === 50)
    assert(hot.forall(_._2 === 1L), "hot cluster must canonicalize to doc 1")
    // isolation, asserted both ways: the hot cluster contains EXACTLY
    // its 50 members, and no distinct rider doc was pulled into it
    // (riders may band-collide among THEMSELVES — never with the
    // boilerplate, whose shingle set they share nothing with)
    assert(hot.forall(_._3 === 50L), "hot cluster absorbed a rider doc")
    assert(comps.filter(_._1 >= 100L).forall(_._2 >= 100L),
      "a rider doc was labeled into the hot cluster")
  }

  test("c21b: post-repair leakage is zero, singletons never move, clusters co-locate") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.01"
    val repair = DedupOps.c21bSplitRepair(spark, sf)
      .select(col("doc_id"), col("cluster_id"), col("new_split"), col("moved"))
      .as[(Long, Long, String, Long)].collect()
    val byDoc = repair.map(r => r._1 -> r).toMap
    // full corpus covered, exactly once
    assert(repair.length === 500 && byDoc.size === 500)
    // every near-dup pair ends up in ONE split — leakage zero by
    // construction, asserted against the actual pair list
    val pairs = DedupOps.c02MinhashLsh(spark, sf)
      .select(col("da"), col("db")).as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture lost its near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(byDoc(a)._3 === byDoc(b)._3,
        s"pair ($a, $b) still straddles splits after repair")
    }
    // a whole cluster shares one new_split, and a singleton (its own
    // representative) can never be marked moved
    repair.groupBy(_._2).foreach { case (cl, rows) =>
      assert(rows.map(_._3).distinct.length === 1, s"cluster $cl split-fragmented")
    }
    repair.filter(_._4 === 1L).foreach { r =>
      assert(r._2 !== r._1, s"singleton ${r._1} was moved")
    }
    // the repair is not vacuous on this fixture: at least one doc in
    // a multi-member cluster crosses the boundary and gets moved
    assert(repair.exists(_._4 === 1L), "fixture exercised no actual move")
  }

  test("c21b deep-chain graph: whole chain co-locates, round-bounded path") {
    import org.apache.spark.sql.functions.col
    // a 1,000-doc dup chain (diameter 999) + 50 singletons through
    // c21b's factored core — the star components keep this bounded
    // where min-label propagation would need ~999 rounds
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("da", "db")
    val ids = (0L until 1050L).toDF("doc_id")
    val rep = DedupOps.splitRepair(ids, chain)
      .select(col("doc_id"), col("cluster_id"), col("old_split"),
        col("new_split"), col("moved"))
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(rep.size === 1050)
    val members = rep.filter(_._1 < 1000L)
    // every chain member joins cluster 0 and adopts ONE split — the
    // representative's own hash-split, so doc 0 itself never moves
    assert(members.forall(_._2 === 0L), "chain fragmented into >1 cluster")
    assert(members.map(_._4).distinct.size === 1, "chain split-fragmented")
    val rep0 = members.find(_._1 === 0L).get
    assert(rep0._3 === rep0._4 && rep0._5 === 0L)
    // moved flags exactly the members whose own split differs
    members.foreach(r => assert((r._5 === 1L) === (r._3 !== r._4)))
    // singletons are their own representative: never moved
    val singles = rep.filter(_._1 >= 1000L)
    assert(singles.forall(r => r._2 === r._1 && r._3 === r._4 && r._5 === 0L))
  }
}
