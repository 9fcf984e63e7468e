package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_cdc_cuts(text, w, div, cmin, cmax)` — the content-defined
  * chunking CUT POINTS of `text` (c42's `cl` column), one fused pass:
  * candidate cuts where the `w`-code-point rolling window's [[H60]]
  * hash is divisible by `div` (cut position = window index + w + 1,
  * 1-based; a cut past the last char is NO cut — the final chunk
  * always ends at len), thinned by the `cmin` minimum spacing
  * (each candidate measured against its PREDECESSOR CANDIDATE — the
  * exact HOF semantics), then `cmax`-spaced forced cuts inserted
  * into any longer gap between accepted posts. Bit-identical to the
  * four-HOF formulation it replaces (transform→filter→filter→
  * gap-fill over `graft_winhash60` output), so the DuckDB oracle
  * twin is unchanged.
  *
  * Why an Expression: the HOF chain pays an interpreted lambda
  * dispatch PER CHARACTER (the window transform + null filter run at
  * window grain, ~len elements) plus three intermediate ArrayData
  * materializations per document — on a corpus-rewrite path. The
  * kernel shares [[WinHash60]]'s byte-walk (code-point offsets
  * computed once, windows hashed straight from the byte slice) and
  * emits only the final cut array.
  *
  * `w`/`div`/`cmin`/`cmax` are constructor constants (the SQL face
  * requires foldable literals); null text → null. */
case class CdcCuts(text: Expression, w: Int, div: Long, cmin: Int, cmax: Int)
    extends UnaryExpression {

  override def child: Expression = text

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && w > 0 && div > 0 && cmin >= 0 && cmax > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_cuts expects (string, w>0, div>0, cmin>=0, cmax>0), got " +
        s"(${text.dataType.catalogString}, $w, $div, $cmin, $cmax)")

  override protected def nullSafeEval(t: Any): Any =
    CdcCuts.cuts(t.asInstanceOf[UTF8String], w, div, cmin, cmax)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.CdcCuts.cuts($t, $w, ${div}L, $cmin, $cmax)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(text = newChild)

  override def prettyName: String = "graft_cdc_cuts"
}

object CdcCuts {

  /** Fold a foldable int-literal expression (the SQL-face contract). */
  private[graft] def lit(e: Expression, name: String): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"graft_cdc_cuts: $name must be an int literal")
    e.eval().asInstanceOf[Int]
  }

  /** Fold a foldable int- or long-literal expression (div's face). */
  private[graft] def litLong(e: Expression, name: String): Long = {
    require(e.foldable &&
      (e.dataType == IntegerType || e.dataType == LongType),
      s"graft_cdc_cuts: $name must be an integral literal")
    e.eval() match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l
    }
  }

  def cuts(text: UTF8String, w: Int, div: Long, cmin: Int, cmax: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point start offsets, once (WinHash60's walk)
    val offs = new Array[Int](bytes.length + 1)
    var nChars = 0
    var pos = 0
    while (pos < bytes.length) {
      offs(nChars) = pos
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      nChars += 1
    }
    offs(nChars) = bytes.length
    val n = nChars
    // accepted candidates after the min-spacing thin: candidate k's
    // reference is the PREVIOUS CANDIDATE (not the previous
    // survivor), doc start (1) for the first — HOF parity
    var accepted = new Array[Int](8)
    var nAcc = 0
    var prevCand = 1
    var haveCand = false
    if (n >= w) {
      var k = 0
      val last = n - w
      while (k <= last) {
        val st = offs(k)
        val en = offs(k + w)
        val h = H60.hashBytes(bytes, st, en - st)
        if (h % div == 0L) {
          val c = k + w + 1
          if (c <= n) {
            val ref = if (haveCand) prevCand else 1
            if (c - ref >= cmin) {
              if (nAcc == accepted.length)
                accepted = java.util.Arrays.copyOf(accepted, nAcc * 2)
              accepted(nAcc) = c
              nAcc += 1
            }
            prevCand = c
            haveCand = true
          }
        }
        k += 1
      }
    }
    // cmax gap fill between posts [1] ++ accepted ++ [n+1]; emitted
    // in gap order, so the result is sorted by construction
    val out = new java.util.ArrayList[Any](nAcc + n / cmax + 1)
    var p = 1
    var a = 0
    while (a <= nAcc) {
      val q = if (a < nAcc) accepted(a) else n + 1
      if (q - p > cmax) {
        var x = p + cmax
        while (x <= q - 1) { out.add(x); x += cmax }
      }
      if (a < nAcc) out.add(q)
      p = q
      a += 1
    }
    new GenericArrayData(out.toArray)
  }
}
