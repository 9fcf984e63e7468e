package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** A24 — dictionary-aware tokenizer as a native Catalyst Generator
  * (the reference's ik_analyze UDTF + LATERAL TABLE,
  * gmall-realtime/.../app/udf/KeywordUDTF.java:14-24 and
  * KeywordStatsApp.java:58-59). One input string → one row per token,
  * with the emitted position.
  *
  * Segmentation: whitespace split, then greedy left-to-right merge of
  * adjacent token pairs found in the phrase dictionary (the "smart
  * mode" shape of a dictionary analyzer, without the GPL IK lexicon).
  * The dictionary keeps phrase heads and tails disjoint, so greedy
  * matching has no overlap ambiguity and a purely windowed SQL twin
  * (lead/lag pair membership) computes the identical result — that is
  * what makes the DuckDB oracle possible.
  *
  * A Generator (vs a Scala UDF returning Seq[String]) keeps the
  * fan-out inside Catalyst's Generate operator: no row-object
  * round-trip per token, and the planner sees the output schema.
  */
case class DictTokenize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .split("\\s+").filter(_.nonEmpty)
      val out = new ArrayBuffer[InternalRow](toks.length)
      var i = 0
      var pos = 0L
      while (i < toks.length) {
        val merged = i + 1 < toks.length &&
          DictTokenize.phrases.contains((toks(i), toks(i + 1)))
        val tok = if (merged) toks(i) + "_" + toks(i + 1) else toks(i)
        out += InternalRow(UTF8String.fromString(tok), pos)
        i += (if (merged) 2 else 1)
        pos += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DictTokenize =
    copy(child = newChild)

  override def prettyName: String = "graft_tokenize"
}

object DictTokenize {
  /** Phrase dictionary. INVARIANT: the set of phrase heads and the
    * set of phrase tails are disjoint — greedy matching is then
    * conflict-free and equivalent to independent pairwise merging
    * (see the oracle twin in operators.DwdOps). */
  val phrases: Set[(String, String)] = Set(
    ("hash", "join"), ("table", "scan"), ("group", "value"))
}
