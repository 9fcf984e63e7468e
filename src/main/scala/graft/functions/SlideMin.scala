package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_slidemin(arr, k)` — the minima of the k-element sliding
  * windows of a LongType array: out(i) = min(arr(i … i+k−1)), i = 0 …
  * max(n−k, 0), trailing windows truncated at the end of the array
  * (so an array shorter than k yields ONE window covering it all, and
  * an empty array yields an empty result).
  *
  * Semantics chosen to be bit-identical to the built-in HOF form
  * `transform(sequence(1, greatest(size(a) - k + 1, 1)),
  * i -> array_min(slice(a, i, k)))` — which the DuckDB oracle keeps
  * (`list_transform(range(1, greatest(len(a) - k + 1, 1) + 1),
  * i -> list_min(a[i:i+k-1]))`) — but computed in one pass with a
  * monotonic deque: O(n) total instead of the HOF's O(n·k) slice
  * allocations, which is what keeps winnowing-fingerprint selection
  * (DedupOps c19) a cheap narrow stage over corpus-sized window-hash
  * arrays.
  *
  * This is the winnowing selection step (Schleimer et al., MOSS):
  * composed as `graft_slidemin(graft_winhash60(text, W, 1), k)`, any
  * substring of length ≥ W+k−1 shared by two documents yields k
  * consecutive equal window hashes in both, so the min over THAT
  * k-window is selected on both sides — equal fingerprint values with
  * no positional tie-break needed.
  */
case class SlideMin(arr: Expression, k: Expression) extends BinaryExpression {

  override def left: Expression = arr
  override def right: Expression = k

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = arr.dataType match {
    case ArrayType(LongType, false) if k.dataType == IntegerType && k.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_slidemin expects (array<bigint> without nulls, int literal), got " +
        s"${arr.dataType.catalogString}, ${k.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, kv: Any): Any =
    SlideMin.minima(a.asInstanceOf[ArrayData], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, kv) => s"graft.functions.SlideMin.minima($a, $kv)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlideMin =
    copy(arr = newLeft, k = newRight)

  override def prettyName: String = "graft_slidemin"
}

object SlideMin {

  /** Sliding k-window minima via a monotonic deque of indices whose
    * values increase head→tail; head is always the current window's
    * argmin. Each index enters and leaves the deque once — O(n). */
  def minima(arr: ArrayData, k: Int): ArrayData = {
    require(k > 0, s"graft_slidemin: k=$k must be positive")
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nWin = math.max(n - k + 1, 1)
    val out = new Array[Any](nWin)
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // live deque slice = dq(head until tail)
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - k) head += 1
      val w = i - k + 1 // full window ending at i starts here
      if (w >= 0) out(w) = arr.getLong(dq(head))
      i += 1
    }
    // n < k: the single (truncated) window is the global min.
    if (n < k) out(0) = arr.getLong(dq(head))
    new GenericArrayData(out)
  }
}
