package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document BPE token count under a
  * trained merge list — the packing/budgeting hot path
  * ([[graft.operators.BpeTrainer.tokenCountCol]]).
  *
  * Why native: the composed form re-segments EVERY word through
  * `aggregate(split(text,' '), …)` whose lambda chains
  * split-wrap-replace×rounds-regexp_replace-split per word — all on
  * Catalyst's interpreted higher-order-function path (lambdas never enter
  * whole-stage codegen). The round-9 wide yardstick measured q133 at
  * 6.8 s and q168 at 6.5 s at the ×10 replica (8.3× / 5.7× DuckDB on the
  * same algorithm); the corpus pass is ~5 s of interpreted dispatch.
  * Here the whole document is ONE eval: per word, the separator-wrapped
  * segmentation string (`|c||a||t|`) is built once and the merge rules
  * apply in training order as literal Java `String.replace` — the same
  * leftmost-non-overlapping scan as Spark's `replace` expression and
  * DuckDB's `replace`, so segmentations (and counts) are bit-identical
  * to the composed form and to the unrolled-SQL oracle
  * (BpeSpec/ClassifierSpec-style equivalence pinned in FtsSpec).
  *
  * Count identity used instead of the final re-split: each successful
  * merge REPLACEMENT reduces the symbol count by exactly one, so
  * tokens(word) = chars(word) − merges-applied, where merges-applied is
  * read off the length delta (each replace shrinks the string by 2
  * separator bytes). The empty word (consecutive spaces) counts 1 — the
  * composed form's `split('','||') = ['']` shape — and null text nulls
  * out. ASCII corpus contract as [[HashedWordCounts]]; chars here are
  * code points. */
case class BpeTokenCount(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  // the literal replace targets/replacements, precomputed once:
  // "|l||r|" -> "|lr|"
  private lazy val targets: Array[String] =
    merges.map(m => "|" + m(0) + "||" + m(1) + "|")
  private lazy val repls: Array[String] =
    merges.map(m => "|" + m(0) + m(1) + "|")

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String].toString,
      targets, repls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val t = ctx.addReferenceObj("targets", targets, "java.lang.String[]")
      val r = ctx.addReferenceObj("repls", repls, "java.lang.String[]")
      s"${ev.value} = graft.functions.BpeTokenCount.count(" +
        s"$str.toString(), $t, $r);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {
  /** Column-level entry point (merge rules as (left, right) in training
    * order). */
  def apply(text: org.apache.spark.sql.Column,
      rules: Seq[(String, String)]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      BpeTokenCount(org.apache.spark.sql.GraftShims.expression(text),
        rules.map(p => Array(p._1, p._2)).toArray))

  /** Shared by interpreted eval and generated code. One pass per word:
    * build the wrapped segmentation, chain the literal replaces, read the
    * applied-merge count off the length deltas. */
  def count(text: String, targets: Array[String],
      repls: Array[String]): Int = {
    var total = 0
    var start = 0
    val n = text.length
    while (start <= n) {
      var end = text.indexOf(' ', start)
      if (end < 0) end = n
      // one word: text[start, end)
      val wordLen = end - start
      if (wordLen == 0) {
        total += 1 // split('','||') = [''] — the composed form's shape
      } else {
        val chars = text.codePointCount(start, end)
        var seg = wrap(text, start, end)
        var applied = 0
        var m = 0
        while (m < targets.length) {
          val before = seg.length
          seg = seg.replace(targets(m), repls(m))
          // each replacement removes exactly two '|' bytes
          applied += (before - seg.length) >> 1
          m += 1
        }
        total += chars - applied
      }
      start = end + 1
    }
    total
  }

  private def wrap(text: String, start: Int, end: Int): String = {
    val sb = new java.lang.StringBuilder((end - start) * 3 + 2)
    sb.append('|')
    var i = start
    while (i < end) {
      val cp = text.codePointAt(i)
      i += Character.charCount(cp)
      sb.appendCodePoint(cp)
      if (i < end) sb.append("||")
    }
    sb.append('|')
    sb.toString
  }
}
