package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-portable primitives: every helper here has a Spark Column
  * form and a DuckDB SQL twin that produce BIT-IDENTICAL values, so
  * hash-based oracle comparison works even for derived numerics.
  *
  *  - Hashing goes through md5 (hex string), which both engines
  *    implement identically; the first 15 hex digits give a 60-bit
  *    non-negative BIGINT. No engine-specific hash (xxhash, DuckDB
  *    hash()) appears anywhere in an oracle-checked path.
  *  - Dot products fold left sequentially in DOUBLE. Both engines
  *    evaluate the same IEEE operation sequence, so results match to
  *    the last bit — float summation-order divergence is designed out
  *    rather than rounded away.
  */
object Portable {

  /** 60-bit hash of a string column (non-negative, fits a BIGINT).
    * Resolves to the native [[graft.functions.H60]] expression; the
    * built-in-only form is [[h60Builtin]] (spec asserts equality). */
  def h60(c: Column): Column =
    call_function("graft_h60", c)

  /** The same value via built-ins only: first 15 md5 hex digits. */
  def h60Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB twin of [[h60]]; `e` is a SQL expression string. */
  def h60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** 60-bit tf-weighted SimHash of a text column — the native
    * [[graft.functions.SimHash60]] expression (per-row, no shuffle).
    * The DuckDB twin stays relational (DedupOps oracle SQL). */
  def simhash60(c: Column): Column =
    call_function("graft_simhash60", c)

  /** Sequential left-fold dot product of two float-array columns in
    * DOUBLE precision: ((0 + a1*b1) + a2*b2) + ...
    *
    * Resolves to the native codegen expression
    * [[graft.functions.DotProduct]] (registered as `graft_dot` by
    * graft.GraftExtensions) — same fold order, ~5× faster than the
    * HOF form. [[dotFold]] keeps the built-in-only form; the spec
    * asserts the two are bit-identical. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** The same fold with only built-in higher-order functions. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, x) => acc + x)

  /** DuckDB twin of [[dot]] for fixed dimension `dim`. The product
    * list is prepended with an explicit 0.0 seed so the fold is
    * ((0 + p1) + p2) + … exactly like Spark's zero-seeded aggregate —
    * including the signed-zero edge: a leading -0.0 product folds to
    * +0.0 on both sides (list_reduce alone would seed with p1 itself
    * and keep -0.0, diverging in the float's string form). */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
}
