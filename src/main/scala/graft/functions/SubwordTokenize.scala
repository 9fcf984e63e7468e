package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** t03b — vocabulary-driven subword tokenization (the DictTokenize
  * family's second member): deterministic greedy LONGEST-MATCH
  * segmentation of each whitespace word against a fixed subword
  * vocabulary, single-character fallback for uncovered spans (so
  * every input segments totally — the WordPiece/BPE-inference shape
  * with a closed vocab instead of t03's regex proxy).
  *
  * Longest-match-first is deterministic: two distinct units cannot
  * both be a longest prefix of the same string (equal length + both
  * prefixes ⇒ equal), so the segmentation needs no tie-break and the
  * DuckDB oracle replays it exactly with a recursive CTE over the
  * same vocabulary literals ([[SubwordTokenize.vocabSqlList]] — one
  * source of truth, pre-sorted by (length desc, unit) so `the first
  * filtered element` IS the longest match).
  *
  * The fallback advances one CODE POINT at a time (surrogate-pair
  * aware), so segmentation is total over all of Unicode and matches
  * the DuckDB oracle's code-point recursion on non-BMP input too;
  * vocabulary units are ASCII.
  *
  * Two surfaces over one segmenter:
  *  - `graft_subword` — a Generator (token, pos rows) for
  *    LATERAL-style token processing, like `graft_tokenize` (A24);
  *  - `graft_subword_arr` — a scalar ARRAY<STRING> for narrow
  *    per-row pipelines (t03b counting, t09c packing) where a
  *    Generate→re-aggregate round trip would shuffle the corpus for
  *    nothing.
  */
case class SubwordTokenize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = SubwordTokenize.tokens(v.asInstanceOf[UTF8String].toString)
      val out = new ArrayBuffer[InternalRow](toks.length)
      var pos = 0L
      toks.foreach { t =>
        out += InternalRow(UTF8String.fromString(t), pos)
        pos += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordTokenize =
    copy(child = newChild)

  override def prettyName: String = "graft_subword"
}

/** Scalar twin: the full subword token array in one codegen'd call. */
case class SubwordArr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_subword_arr expects a string, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SubwordTokenize.tokensArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordTokenize.tokensArray($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordArr =
    copy(child = newChild)

  override def prettyName: String = "graft_subword_arr"
}

object SubwordTokenize {

  /** Fixture vocabulary: whole-word units for the corpus's frequent
    * words plus 2-3 character units covering the rest, so typical
    * words segment into 1-3 subwords. Membership, not linguistics,
    * is the point — the contract is deterministic longest-match. */
  val units: Seq[String] = Seq(
    "stream", "filter", "window", "custom", "spark", "value", "query",
    "slo", "ble", "tch", "rge", "all", "big", "the",
    "ta", "sc", "an", "jo", "in", "or", "de", "gr", "ou", "co", "lu",
    "mn", "so", "rt", "li", "ne", "ba", "me", "ha", "sh", "pa", "fa",
    "st", "ro", "ke", "da", "ve", "ct", "ag", "er", "ow", "ey", "ry",
    "up", "sm")

  /** Units sorted (length desc, unit) — scan order for longest-match. */
  private val byLen: Array[String] = units.sortBy(u => (-u.length, u)).toArray

  /** The same vocabulary as a DuckDB list literal, in the same scan
    * order, for the oracle's `list_filter(...)[1]` longest-match. */
  def vocabSqlList: String = byLen.map(u => s"'$u'").mkString("[", ", ", "]")

  /** Greedy longest-match segmentation of one word appended to `out`;
    * single-code-point fallback guarantees progress on any input.
    * The fallback advances by `Character.charCount` so a non-BMP
    * character (surrogate pair in UTF-16) stays ONE token — the same
    * unit the DuckDB oracle's code-point recursion emits — instead of
    * splitting into two lone-surrogate fragments. */
  private def appendTokens(word: String, out: ArrayBuffer[String]): Unit = {
    var p = 0
    while (p < word.length) {
      var matched: String = null
      var i = 0
      while (matched == null && i < byLen.length) {
        if (word.startsWith(byLen(i), p)) matched = byLen(i)
        i += 1
      }
      val tok =
        if (matched != null) matched
        else word.substring(p, p + Character.charCount(word.codePointAt(p)))
      out += tok
      p += tok.length
    }
  }

  /** Whitespace words → flat subword stream (word order preserved). */
  def tokens(text: String): ArrayBuffer[String] = {
    val words = text.split("\\s+")
    val out = new ArrayBuffer[String](words.length * 2)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) appendTokens(words(i), out)
      i += 1
    }
    out
  }

  /** Codegen entry: UTF8String → ArrayData of UTF8String tokens. */
  def tokensArray(text: UTF8String): ArrayData = {
    val toks = tokens(text.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      arr(i) = UTF8String.fromString(toks(i))
      i += 1
    }
    new GenericArrayData(arr)
  }
}
