package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: reassemble the text of the SELECTED
  * non-overlapping `blockWords`-word blocks of a document, space-joined in
  * position order — the paragraph-dedup survivor reassembly
  * ([[graft.operators.Curation.dedupParagraphs]]'s final step).
  *
  * Block k covers words [blockWords·k+1, blockWords·k+blockWords] of the
  * single-space-separated text; since consecutive words join back with a
  * single space, each block IS a substring of the original text
  * (the [[OverlappingChunks]] identity), and the reassembled survivor
  * text is those substrings joined by one space. One scan for word-start
  * offsets, one output builder — no words array, no per-block lambdas,
  * no collect_list of block texts through a shuffle.
  *
  * `positions` must be sorted ascending (the caller sorts the survivor
  * ids); out-of-range positions fail loudly rather than silently
  * reassembling a wrong document. Null text or null positions null out.
  * An empty positions array yields "" (a fully-scrubbed doc — its
  * fingerprint is md5('')). */
case class SelectedWordBlocks(left: Expression, right: Expression,
    blockWords: Int) extends BinaryExpression {
  require(blockWords > 0, s"blockWords=$blockWords out of range")

  override def dataType: DataType = StringType
  override def prettyName: String = "selected_word_blocks"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<int>) input, got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(text: Any, positions: Any): Any =
    SelectedWordBlocks.assemble(text.asInstanceOf[UTF8String].toString,
      positions.asInstanceOf[ArrayData], blockWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.SelectedWordBlocks.assemble(" +
        s"$t.toString(), $p, $blockWords);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SelectedWordBlocks {
  /** Column-level entry point (`positions` a sorted `array<int>` column). */
  def apply(text: org.apache.spark.sql.Column,
      positions: org.apache.spark.sql.Column,
      blockWords: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      SelectedWordBlocks(org.apache.spark.sql.GraftShims.expression(text),
        org.apache.spark.sql.GraftShims.expression(positions), blockWords))

  /** Shared by interpreted eval and generated code. */
  def assemble(text: String, positions: ArrayData,
      blockWords: Int): UTF8String = {
    val n = text.length
    var nWords = 1
    var i = 0
    while (i < n) {
      if (text.charAt(i) == ' ') nWords += 1
      i += 1
    }
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < n) {
      if (text.charAt(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val nBlocks = (nWords - 1) / blockWords + 1
    val sb = new java.lang.StringBuilder(n)
    val m = positions.numElements()
    var j = 0
    while (j < m) {
      val k = positions.getInt(j)
      require(k >= 0 && k < nBlocks,
        s"block position $k out of range [0, $nBlocks) for a " +
          s"$nWords-word document")
      val a = k * blockWords
      val b = math.min(a + blockWords, nWords) - 1
      val from = starts(a)
      val to = if (b == nWords - 1) n else starts(b + 1) - 1
      if (j > 0) sb.append(' ')
      sb.append(text, from, to)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
