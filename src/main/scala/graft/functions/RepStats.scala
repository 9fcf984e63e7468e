package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_rep_stats(tokens)` — the t08 repetition-signal bundle in
  * ONE fused pass: `struct(n_tok, n_distinct, top_tok_ct, n_bigram,
  * n_dup_bigram)` (all BIGINT).
  *
  * Semantics ≡ the HOF formulation it replaces (the DuckDB oracle
  * t08Sql is unchanged):
  *  - `n_distinct`  = `size(array_distinct(tokens))`
  *  - `top_tok_ct`  = the max frequency of any token (the sorted-run
  *    `aggregate(array_sort(…))` computed exactly this)
  *  - `n_bigram`    = max(n_tok − 1, 0)
  *  - `n_dup_bigram`= n_bigram − count(distinct adjacent "a b"
  *    strings). Tokens come from `split(text, '\\s+')` so they
  *    contain no whitespace, which makes the concatenated-string
  *    identity of the HOF/oracle form equal to adjacent-PAIR
  *    identity — the kernel dedups integer pair codes instead of
  *    building n−1 strings.
  *
  * Why an Expression: the HOF form paid, per document, an
  * interpreted `aggregate` lambda over a comparator-sorted copy plus
  * a `transform` building n−1 bigram strings plus `array_distinct`
  * over those strings — the top cold line of the whole bench
  * (t08 6.9 s) and the per-row tax of the t25 one-pass annotator,
  * the flagship 100 TB corpus scan. Here: one hash of each token to
  * a dense id (frequency count = distinct count = top count in the
  * same map), one long-set of `(id[i] << 32) | id[i+1]` pair codes.
  * O(n) with no sort, no per-gram string, no lambda dispatch.
  *
  * Contract: null `tokens` → null struct (so `n_tok`/`n_bigram`
  * stay null for null text, as before); null ELEMENTS (never
  * produced by split) count as one distinct token value. */
case class RepStats(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens

  override def dataType: DataType = RepStats.outType

  override def checkInputDataTypes(): TypeCheckResult =
    tokens.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_rep_stats expects array<string>, got ${t.catalogString}")
    }

  override protected def nullSafeEval(t: Any): Any =
    RepStats.stats(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.RepStats.stats($t)")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(tokens = newChild)

  override def prettyName: String = "graft_rep_stats"
}

object RepStats {

  val outType: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_tok_ct", LongType, nullable = false),
    StructField("n_bigram", LongType, nullable = false),
    StructField("n_dup_bigram", LongType, nullable = false)))

  def stats(toks: ArrayData): GenericInternalRow = {
    val n = toks.numElements()
    // token → dense id; frequency lives beside the id so one map
    // serves distinct-count, top-count, and the bigram pair codes.
    val ids = new java.util.HashMap[UTF8String, Array[Int]](Math.max(16, n))
    val tokId = new Array[Int](n)
    var nullId = -1 // dense id assigned to a null element, if any
    var nullCt = 0
    var next = 0
    var top = 0
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        if (nullId < 0) { nullId = next; next += 1 }
        nullCt += 1
        if (nullCt > top) top = nullCt
        tokId(i) = nullId
      } else {
        val t = toks.getUTF8String(i)
        var slot = ids.get(t)
        if (slot == null) {
          slot = Array(next, 0)
          // UTF8String may point into a reused buffer; clone defensively
          ids.put(t.clone(), slot)
          next += 1
        }
        slot(1) += 1
        if (slot(1) > top) top = slot(1)
        tokId(i) = slot(0)
      }
      i += 1
    }
    val nBigram = Math.max(n - 1, 0)
    var nDup = 0L
    if (nBigram > 0) {
      val pairs = new java.util.HashSet[java.lang.Long](Math.max(16, nBigram))
      var j = 0
      while (j < nBigram) {
        if (!pairs.add((tokId(j).toLong << 32) | (tokId(j + 1).toLong & 0xFFFFFFFFL)))
          nDup += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](
      n.toLong, next.toLong, top.toLong, nBigram.toLong, nDup))
  }
}
