package graft.operators

import graft.SparkSpec

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
}
