package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass duplicated-span excision — the rebuild step of exact
  * substring dedup (Lee et al. 2022; [[graft.operators.Curation.scrubDuplicatedSpans]],
  * q153): given a document and the SORTED 1-based start positions of its
  * duplicated `n`-grams, emit `(n_words, n_kept, scrubbed)` where every
  * word covered by any interval `[s, s+n-1]` is cut and the survivors are
  * re-joined with single spaces, in order.
  *
  * Replaces the round-10 composed form — `filter(ws, (w,i) =>
  * !array_contains(cps, i+1))` over an EXPLODED covered-position set — which
  * had two compounding scale defects the ×100 yardstick measured at 3.5×
  * DuckDB with a RISING slope (bench/r10/yardstick_x100_adjudicated.json):
  * the HOF lambda never enters whole-stage codegen (the repo's round-9
  * lesson), and its `array_contains` is a LINEAR probe per word, i.e.
  * O(words × covered) interpreted per doc — quadratic per doc once
  * duplication saturates (at the ×1000 replica every gram is duplicated, so
  * covered == words). This kernel is a MERGED scan of the word stream and
  * the sorted start list — O(words + starts) inside codegen — and its input
  * aggregation shrinks n-fold too: the caller ships one row per duplicated
  * OCCURRENCE (its start) instead of n exploded cover positions.
  *
  * Word semantics are exactly `split(text, ' ')` with Spark's limit=-1:
  * words are the byte runs between 0x20 bytes (UTF-8-safe — multi-byte
  * sequences never contain ASCII 0x20), consecutive/leading/trailing spaces
  * delimit empty words, and the empty text is one empty word. Survivors
  * join as `concat_ws(' ', ...)` does, so a doc with no covered word
  * round-trips byte-identical (fast path returns the input buffer).
  * Starts above `n_words` (or at/below `-n`) never cover anything — the
  * same no-op the composed form's `array_contains` gave them; a start
  * `s <= 0` with `s + n - 1 >= 1` DOES cover the leading words of its
  * clipped interval, identically in both forms. `starts` MUST be sorted
  * ascending (the merged scan consumes it monotonically — the only
  * production caller sorts via `sort_array`); unsorted input is undefined
  * and silently under-covers, it does not throw. Null text or null starts
  * null out — callers coalesce the no-duplicates case to an empty array. */
case class ScrubCoveredWords(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n > 0, s"gram width n=$n out of range")

  override def dataType: DataType = ScrubCoveredWords.outType
  override def prettyName: String = "scrub_covered_words"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<int>) input, got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(text: Any, starts: Any): Any =
    ScrubCoveredWords.compute(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.ScrubCoveredWords.compute($t, $s, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ScrubCoveredWords {
  val outType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))

  /** Column entry point; `starts` a sorted-ascending `array<int>` of
    * 1-based duplicated-gram start positions (empty = nothing cut). */
  def apply(text: org.apache.spark.sql.Column,
      starts: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      ScrubCoveredWords(org.apache.spark.sql.GraftShims.expression(text),
        org.apache.spark.sql.GraftShims.expression(starts), n))

  /** Static kernel (generated code and nullSafeEval both land here). */
  def compute(text: UTF8String, starts: ArrayData, n: Int): InternalRow = {
    val b = text.getBytes
    val len = b.length
    val m = starts.numElements()
    if (m == 0) {
      // no duplicated span: survivors == words, rebuilt text == input
      var nWords = 1L
      var i = 0
      while (i < len) {
        if (b(i) == ' ') nWords += 1
        i += 1
      }
      return InternalRow(nWords, nWords, text)
    }
    val out = new Array[Byte](len)
    var outLen = 0
    var nKept = 0L
    var p = 1 // 1-based word position
    var j = 0 // cursor into the sorted starts
    var coveredUntil = 0 // max(s + n - 1) over consumed starts
    var wordStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || b(i) == ' ') {
        while (j < m && starts.getInt(j) <= p) {
          val e = starts.getInt(j) + n - 1
          if (e > coveredUntil) coveredUntil = e
          j += 1
        }
        if (p > coveredUntil) {
          if (nKept > 0) { out(outLen) = ' '; outLen += 1 }
          val w = i - wordStart
          System.arraycopy(b, wordStart, out, outLen, w)
          outLen += w
          nKept += 1
        }
        p += 1
        wordStart = i + 1
      }
      i += 1
    }
    InternalRow(p - 1L, nKept, UTF8String.fromBytes(out, 0, outLen))
  }
}
