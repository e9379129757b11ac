package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static single-pass implementation of the T2 quality metrics — the
  * compute behind [[GraftQuality]]. Kept as plain JVM code so the
  * generated (janino) call site is one line and the scan loop runs as
  * ordinary JIT-compiled bytecode.
  *
  * Bit-identical by construction to the expression formulation it
  * replaces (`TextAnalysis.withQualityExprs`, kept for the parity spec):
  *
  *  - words = regexp_extract_all(lower(text), '[a-z]+'): `[a-z]` is pure
  *    ASCII and ASCII bytes never occur inside a UTF-8 multi-byte
  *    sequence, so counting maximal a-z byte runs over the LOWERED
  *    string's bytes is exactly the regex's match count; lowercasing via
  *    `UTF8String.toLowerCase` is the same call Spark's `lower()` makes.
  *  - stop hits: each run compared byte-wise against the 10 English
  *    stopwords (`TextAnalysis.lexicons`).
  *  - punct count = length(regexp_replace(lowered, '[a-z0-9 ]', '')):
  *    code points of the lowered string minus its [a-z0-9 ] bytes
  *    (code points = bytes that are not UTF-8 continuation bytes).
  *  - denominator nChars = length(original text) — the ORIGINAL string's
  *    code points (locale-free lowercasing can change code-point counts,
  *    e.g. U+0130 → "i"+combining dot, so the two counts are tracked
  *    separately).
  *  - double arithmetic in the same order as the column expressions, and
  *    the deterministic rounding snap replicated through the same
  *    BigDecimal path as `Cast(DoubleType→Decimal(18,10))` then
  *    `round(_, 4)`: BigDecimal.valueOf (the toString-based constructor
  *    Spark's `Decimal.fromDouble` uses) → setScale(10, HALF_UP) →
  *    setScale(4, HALF_UP) → doubleValue.
  *  - null semantics: zero words → null stop_ratio (and null score, via
  *    null propagation through `+`; `least(1.0, null)` skips the null);
  *    empty text → null punct_ratio too. A null text row returns a null
  *    struct, so every field reads null — same as `size(null)` etc.
  */
object QualityMetrics {

  private val Stopwords: Array[Array[Byte]] =
    TextAnalysis.lexicons.toMap.apply("en")
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  private def isStop(b: Array[Byte], start: Int, len: Int): Boolean = {
    var s = 0
    while (s < Stopwords.length) {
      val w = Stopwords(s)
      if (w.length == len) {
        var j = 0
        while (j < len && b(start + j) == w(j)) j += 1
        if (j == len) return true
      }
      s += 1
    }
    false
  }

  private def codePoints(b: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) c += 1
      i += 1
    }
    c
  }

  /** round(cast(d as decimal(18,10)), 4) cast back to double — the exact
    * BigDecimal chain of the Catalyst ops it mirrors. */
  def rdet(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  def compute(text: UTF8String): InternalRow = {
    val lowered = text.toLowerCase.getBytes
    var nWords = 0
    var stopHits = 0
    var goodAscii = 0 // [a-z0-9 ] bytes of the lowered string
    var i = 0
    val n = lowered.length
    while (i < n) {
      val c = lowered(i)
      if (c >= 'a' && c <= 'z') {
        val start = i
        while (i < n && lowered(i) >= 'a' && lowered(i) <= 'z') i += 1
        nWords += 1
        if (isStop(lowered, start, i - start)) stopHits += 1
        goodAscii += i - start
      } else {
        if ((c >= '0' && c <= '9') || c == ' ') goodAscii += 1
        i += 1
      }
    }
    val nCharsOrig = text.numChars()
    val punctCount = codePoints(lowered) - goodAscii
    val row = new GenericInternalRow(4)
    row.update(0, nWords)
    if (nWords > 0)
      row.update(1, rdet(stopHits.toDouble / nWords.toDouble))
    else row.setNullAt(1)
    val punctRaw =
      if (nCharsOrig > 0) punctCount.toDouble / nCharsOrig.toDouble
      else Double.NaN // sentinel: unused when null
    if (nCharsOrig > 0) row.update(2, rdet(punctRaw)) else row.setNullAt(2)
    if (nWords > 0 && nCharsOrig > 0) {
      val stopRaw = stopHits.toDouble / nWords.toDouble
      val score = math.min(1.0, nWords.toDouble / 100.0) * 0.5 +
        stopRaw * 0.3 + (1.0 - punctRaw) * 0.2
      row.update(3, rdet(score))
    } else row.setNullAt(3)
    row
  }
}

/** Static single-pass implementation of the T1 language-ID heuristic —
  * the compute behind [[GraftLangId]]. Same word-run scan as
  * [[QualityMetrics]], but counting per-lexicon stopword hits for all
  * four lexicons in the one pass (the column formulation walks the
  * word array once per lexicon through interpreted lambda machinery).
  *
  * Winner selection replicates `greatest(struct(hits, lang)*)`
  * lexicographic struct ordering exactly: highest hits wins, ties break
  * to the lexicographically LAST language — achieved by scanning
  * languages in their (alphabetically sorted) declaration order and
  * keeping `>=`. Zero hits everywhere → ("fr", 0), same as greatest. */
object LangIdMetrics {

  private val Langs: Array[UTF8String] =
    TextAnalysis.lexicons.map(l => UTF8String.fromString(l._1)).toArray
  private val Lexicons: Array[Array[Array[Byte]]] =
    TextAnalysis.lexicons.map(_._2
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray).toArray

  private def hasWord(lex: Array[Array[Byte]], b: Array[Byte],
                      start: Int, len: Int): Boolean = {
    var s = 0
    while (s < lex.length) {
      val w = lex(s)
      if (w.length == len) {
        var j = 0
        while (j < len && b(start + j) == w(j)) j += 1
        if (j == len) return true
      }
      s += 1
    }
    false
  }

  def compute(text: UTF8String): InternalRow = {
    val lowered = text.toLowerCase.getBytes
    val hits = new Array[Int](Lexicons.length)
    var i = 0
    val n = lowered.length
    while (i < n) {
      if (lowered(i) >= 'a' && lowered(i) <= 'z') {
        val start = i
        while (i < n && lowered(i) >= 'a' && lowered(i) <= 'z') i += 1
        var l = 0
        while (l < Lexicons.length) {
          if (hasWord(Lexicons(l), lowered, start, i - start)) hits(l) += 1
          l += 1
        }
      } else i += 1
    }
    var best = 0
    var l = 1
    while (l < hits.length) {
      if (hits(l) >= hits(best)) best = l // >= : ties go to the LAST lang
      l += 1
    }
    val row = new GenericInternalRow(2)
    row.update(0, Langs(best))
    row.update(1, hits(best))
    row
  }
}

/** `graft_langid(text)`: the T1 heuristic language IDer — (lang_pred,
  * n_hits) — as one codegen'd expression instead of four interpreted
  * `filter(words, ...)` lambda walks over a per-row materialized word
  * array. One byte scan per row; a flagship full-corpus operator at
  * 100 TB. Parity with the column formulation is spec-pinned
  * (TextAnalysisSpec) and the DuckDB oracle is unchanged. */
case class GraftLangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_langid requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("n_hits", IntegerType, nullable = false)))

  override def prettyName: String = "graft_langid"

  override def nullSafeEval(v: Any): Any =
    LangIdMetrics.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangIdMetrics.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GraftLangId =
    copy(child = newChild)
}

/** `graft_quality(text)`: the T2 quality metrics — (n_words, stop_ratio,
  * punct_ratio, score) — as ONE codegen'd expression node instead of the
  * ~150-node column-expression tree it replaces.
  *
  * Two costs motivate this beyond per-row speed (one byte scan, no
  * intermediate word-array materialization — vs four regex walks each
  * allocating an array per row):
  *  1. the streaming ingest gate re-analyzes, re-optimizes and re-plans
  *     its tree EVERY micro-batch, so per-op insert latency scales with
  *     plan node count;
  *  2. every task ships the serialized plan, so node count also taxes
  *     task dispatch on every batch of a 100 TB scan.
  * Field access via `getField` keeps one shared subtree per metric;
  * whole-stage codegen's subexpression elimination evaluates the struct
  * once per row. */
case class GraftQuality(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_quality requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = true),
    StructField("punct_ratio", DoubleType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  override def prettyName: String = "graft_quality"

  override def nullSafeEval(v: Any): Any =
    QualityMetrics.compute(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualityMetrics.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GraftQuality =
    copy(child = newChild)
}
