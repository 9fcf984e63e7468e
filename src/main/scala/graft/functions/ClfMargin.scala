package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_clf_margin(toks, prefix, weights)` — the hashed bag-of-words
  * linear-classifier margin Σ_tok weights[h60(prefix ∥ tok) mod
  * len(weights)] as one fused loop. Bit-identical to the interpreted
  * fold it replaces,
  * `aggregate(toks, 0L, (acc, t) -> acc + element_at(w,
  * (h60(concat(prefix, t)) % B + 1)))` — null array → null, and a
  * null ELEMENT poisons the fold to null (`acc + null`), reproduced
  * exactly (ClfMarginSpec pins both classifier shapes) — so the
  * DuckDB oracle twins are unchanged.
  *
  * t33b applies its LEARNED 256-bucket table with prefix "clfb:";
  * t28's fixed stand-in table (bucket weight = a second hash of the
  * bucket id) folds the second hash into a 4096-long literal built
  * driver-side with the same [[H60]], so both gates become this one
  * kernel with different literals.
  *
  * Why an Expression: the [[CountIn]] rationale — the fold paid an
  * interpreted per-token lambda dispatch plus a UTF8String concat
  * allocation and boxed element_at on every token of every gated
  * document; here the MD5 (the irreducible cost) runs over the
  * prefix and token bytes with no intermediate concat string, inside
  * the scan's codegen stage. */
case class ClfMargin(toks: Expression, prefix: Expression,
    weights: Expression) extends TernaryExpression {

  override def first: Expression = toks
  override def second: Expression = prefix
  override def third: Expression = weights

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, prefix.dataType, weights.dataType) match {
      case (ArrayType(StringType, _), StringType, ArrayType(LongType, false))
        if prefix.foldable && weights.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, p, w) => TypeCheckResult.TypeCheckFailure(
        "graft_clf_margin expects (array<string>, string literal, " +
          "array<bigint not null> literal), got " +
          Seq(t, p, w).map(_.catalogString).mkString(", "))
    }

  // a null element yields a null margin (the fold's `acc + null`
  // shape), so the expression is null-producing even on a non-null
  // array and must evaluate via the boxed path.
  override def nullable: Boolean = true

  override protected def nullSafeEval(t: Any, p: Any, w: Any): Any =
    ClfMargin.margin(t.asInstanceOf[ArrayData],
      p.asInstanceOf[UTF8String], w.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("marginBoxed")
    nullSafeCodeGen(ctx, ev, (t, p, w) => s"""
      java.lang.Long $boxed = (java.lang.Long)
        graft.functions.ClfMargin.margin($t, $p, $w);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ClfMargin =
    copy(toks = newFirst, prefix = newSecond, weights = newThird)

  override def prettyName: String = "graft_clf_margin"
}

object ClfMargin {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** h60(prefix ∥ tok) without materializing the concatenated string:
    * MD5 over the two byte runs (UTF-8 concat ≡ byte concat) — the
    * same first-60-bits extraction as [[H60.hashBytes]]. */
  private def hashWithPrefix(prefix: Array[Byte], tok: UTF8String): Long = {
    val m = md.get()
    m.reset()
    m.update(prefix)
    val b = tok.getBytes
    m.update(b, 0, b.length)
    val d = m.digest()
    val hi =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    hi >>> 4
  }

  /** Boxed so the null-poisoning corner survives codegen: null when
    * any element is null, else the Long margin. The weight table is
    * a foldable literal, so `weights` repeats per batch — bounded
    * (≤ 4096 longs) and already deserialized. */
  def margin(toks: ArrayData, prefix: UTF8String, weights: ArrayData): Any = {
    val pb = prefix.getBytes
    val nb = weights.numElements()
    val n = toks.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val h = hashWithPrefix(pb, toks.getUTF8String(i))
      s += weights.getLong((h % nb).toInt)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}
