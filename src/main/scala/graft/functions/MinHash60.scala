package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** K=16 min-hash signature of a (distinct) shingle array in ONE
  * codegen'd pass: each shingle is hashed once with the portable
  * [[H60]], reduced mod the prime P = 2^31-1, and the K universal-
  * family values (A_k * h + B_k) mod P update K running minima.
  *
  * The DuckDB oracle keeps the relational form — MIN over the
  * exploded (doc_id, shingle) table of the same family with the same
  * literals (DedupOps.c02Ctes) — which pins equivalence: min over a
  * per-doc distinct array ≡ MIN over the distinct exploded rows, and
  * every product stays below 2^62 so BIGINT math is exact in both
  * engines.
  *
  * Why an expression: the HOF form (transform + 16 × array_min ∘
  * transform) evaluates interpreted lambdas per element and allocates
  * 17 intermediate arrays per document; signature generation is the
  * bulk of MinHash-LSH compute at 100 TB and belongs in a tight
  * per-row loop inside the scan stage — no shuffle, no allocation.
  */
case class MinHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isPreHashed: Boolean =
    child.dataType match { case ArrayType(LongType, _) => true; case _ => false }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash60 expects array<string> or array<bigint> (pre-hashed), " +
            s"got ${t.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    if (isPreHashed) MinHash60.minimaHashed(input.asInstanceOf[ArrayData])
    else MinHash60.minima(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isPreHashed) "minimaHashed" else "minima"
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash60.$m($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash60"
}

object MinHash60 {
  val K = 16
  val P = 2147483647L // 2^31 - 1
  /** Family constants derived from the portable hash so the oracle
    * SQL can embed the identical literals. A_k ∈ [1, P-1], B_k ∈
    * [0, P-1]. */
  val A: Array[Long] = Array.tabulate(K)(i => H60.hashString(s"mh-a:$i") % (P - 1) + 1)
  val B: Array[Long] = Array.tabulate(K)(i => H60.hashString(s"mh-b:$i") % P)

  def minima(arr: ArrayData): ArrayData = {
    val mins = Array.fill(K)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // null elements are skipped, matching MIN-over-rows semantics
      // (the dedup pipeline never produces them, but the function is
      // registered session-wide and must not NPE on nullable arrays)
      if (s != null) update(mins, H60.hash(s) % P)
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Same minima over PRE-HASHED 60-bit shingle values (the dedup
    * pipelines already carry h60(shingle) longs — re-hashing here
    * would double the md5 work; minima are invariant under element
    * dedup and ordering, so the hashed and string forms agree
    * whenever the long array holds h60 of the strings). */
  def minimaHashed(arr: ArrayData): ArrayData = {
    val mins = Array.fill(K)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) update(mins, arr.getLong(i) % P)
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def update(mins: Array[Long], hm: Long): Unit = {
    var k = 0
    while (k < K) {
      val v = (A(k) * hm + B(k)) % P
      if (v < mins(k)) mins(k) = v
      k += 1
    }
  }
}
