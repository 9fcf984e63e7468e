package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** graft_slidemin (the c19 winnow-selection primitive): equivalence
  * with the built-in HOF form (the DuckDB oracle's shape), edge
  * semantics (empty / shorter-than-k / k=1), and the winnowing
  * guarantee c19 rests on: K consecutive equal window hashes always
  * yield an equal selected fingerprint, whatever the alignment. */
class SlideMinSpec extends SparkSpec {
  import spark.implicits._

  private def native(xs: Seq[Long], k: Int): Seq[Long] =
    SlideMin.minima(new GenericArrayData(xs.toArray), k).toLongArray().toSeq

  private def brute(xs: Seq[Long], k: Int): Seq[Long] =
    if (xs.isEmpty) Seq.empty
    else (0 until math.max(xs.size - k + 1, 1)).map(i => xs.slice(i, i + k).min)

  test("deque minima equal the brute-force window minima") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 2, 8, 9, 10, 100); k <- Seq(1, 2, 9, 100)) {
      val xs = Seq.fill(n)(rnd.nextLong())
      assert(native(xs, k) === brute(xs, k), s"n=$n k=$k")
    }
    // runs of equal values exercise the >= pop rule
    assert(native(Seq(5L, 5L, 5L, 1L, 5L), 2) === brute(Seq(5L, 5L, 5L, 1L, 5L), 2))
  }

  test("expression equals the HOF form the oracle keeps") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(40)(Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong())) :+
      Seq.empty[Long]
    val df = rows.toDF("h")
    val got = df.select(call_function("graft_slidemin", col("h"), lit(9)))
      .as[Seq[Long]].collect()
    val want = df.selectExpr(
      """CASE WHEN size(h) = 0 THEN array()
        |ELSE transform(sequence(1, greatest(size(h) - 8, 1)),
        |  i -> array_min(slice(h, i, 9))) END""".stripMargin)
      .as[Seq[Long]].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("edges: empty in empty out; n < k collapses to the global min; k=1 is identity") {
    assert(native(Seq.empty, 5) === Seq.empty)
    assert(native(Seq(9L, 3L, 7L), 5) === Seq(3L))
    val xs = Seq(4L, 1L, 8L)
    assert(native(xs, 1) === xs)
  }

  test("a W+K-1 shared run always yields a shared fingerprint; W+K-2 can miss") {
    val (w, k) = (32, 9) // DedupOps SELF_W / SELF_K → 40-char guarantee
    def fps(text: String): Set[Long] =
      native(WinHash60.hashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), w, 1)
        .toLongArray().toSeq, k).toSet
    def randish(tag: String, n: Int): String =
      (0 until n).map(i => ('a' + (H60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$tag:$i")) % 26)).toChar).mkString
    val sharedHit = randish("hit", w + k - 1)
    // Below the guarantee, winnowing misses PROBABILISTICALLY (the
    // run's min must lose every overlapping winnow window on one
    // side) — at w+k-2 this deterministic fixture happens to catch
    // every alignment; w+k-3 is the longest run with witnesses here.
    val sharedMiss = randish("miss", w + k - 3)
    val aHit = fps(s"${randish("a1", 17)}$sharedHit${randish("a2", 11)}")
    val aMiss = fps(s"${randish("a1", 17)}$sharedMiss${randish("a2", 11)}")
    (0 until 2 * k).foreach { off =>
      val b = s"${randish("b", off)}$sharedHit${randish("t", 13)}"
      assert(fps(b).intersect(aHit).nonEmpty,
        s"guarantee-length run missed at offset $off")
    }
    val misses = (0 until 2 * k).count { off =>
      val b = s"${randish("b", off)}$sharedMiss${randish("t", 13)}"
      fps(b).intersect(aMiss).isEmpty
    }
    assert(misses > 0,
      "below the guarantee length at least one alignment should miss " +
        "(otherwise the winnow guarantee is vacuous at this fixture)")
  }
}
