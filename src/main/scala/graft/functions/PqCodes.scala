package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All-subspace product-quantization encoder as ONE per-row call:
  * `graft_pqcodes(qv, flat_codebook, subs, ksub)` → array<int> of
  * `subs` code ids.
  *
  * Semantics are exactly the relational form it replaces (VectorOps
  * codeCol: per subspace, argmin integer squared-L2 against the
  * literal codebook, ties to the smallest code id) — the DuckDB
  * oracle keeps the relational algorithm, and PqAnnSpec pins the two
  * forms equal row-for-row. The codebook ships as a foldable
  * array<bigint> literal laid out [m][cid][dim] (subs·ksub·subdim
  * entries, ≤ 1024 longs here — the driver-held broadcast-config
  * pattern), evaluated once at plan time, not per row.
  *
  * Why an Expression: the relational encoder builds, PER ROW,
  * subs·ksub struct(d, cid) values whose distance child is an
  * interpreted aggregate/zip_with over a sliced sub-vector — ~128
  * lambda tree-walks and as many transient arrays per row, with no
  * whole-stage codegen and no subexpression elimination. This is the
  * m04/phash lesson applied to the PQ family (c22/c22b/c22c/c26):
  * one codegen'd call, zero per-row allocations beyond the code
  * array. */
case class PqCodes(qv: Expression, cb: Expression,
    subsE: Expression, ksubE: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(qv, cb, subsE, ksubE)
  override def nullable: Boolean = qv.nullable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def arrL(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (arrL(qv.dataType) && arrL(cb.dataType) && cb.foldable &&
        subsE.dataType == IntegerType && subsE.foldable &&
        ksubE.dataType == IntegerType && ksubE.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_pqcodes expects (array<bigint>, foldable array<bigint>, " +
          "foldable int, foldable int)")
  }

  @transient private lazy val cbArr: Array[Long] =
    cb.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val subs: Int = subsE.eval(null).asInstanceOf[Int]
  @transient private lazy val ksub: Int = ksubE.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val v = qv.eval(input)
    if (v == null) null
    else PqCodes.encode(v.asInstanceOf[ArrayData], cbArr, subs, ksub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cbArr, "long[]")
    val qvCode = qv.genCode(ctx)
    ev.copy(code =
      code"""
        ${qvCode.code}
        boolean ${ev.isNull} = ${qvCode.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PqCodes.encode(
            ${qvCode.value}, $cbRef, $subs, $ksub);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqCodes =
    copy(qv = newChildren(0), cb = newChildren(1),
      subsE = newChildren(2), ksubE = newChildren(3))

  override def prettyName: String = "graft_pqcodes"
}

object PqCodes {
  /** Argmin-L2 code per subspace; ties keep the smallest cid (strict
    * `<` while scanning cid ascending — identical to the struct-min
    * tie-break of the relational form). */
  def encode(qv: ArrayData, cb: Array[Long], subs: Int, ksub: Int): ArrayData = {
    val subdim = cb.length / (subs * ksub)
    val codes = new Array[Int](subs)
    var m = 0
    while (m < subs) {
      var best = Long.MaxValue
      var bestCid = 0
      var cid = 0
      while (cid < ksub) {
        var d = 0L
        var i = 0
        val base = (m * ksub + cid) * subdim
        val voff = m * subdim
        while (i < subdim) {
          val diff = qv.getLong(voff + i) - cb(base + i)
          d += diff * diff
          i += 1
        }
        if (d < best) { best = d; bestCid = cid }
        cid += 1
      }
      codes(m) = bestCid
      m += 1
    }
    new GenericArrayData(codes)
  }
}
