package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the overlapping-window chunk texts of a
  * document — chunk k covers words [stride·k+1, stride·k+size] of the
  * single-space-separated text, ⌊(nWords−1)/stride⌋+1 chunks per doc, the
  * tail chunk short but never dropped ([[graft.operators.Curation.chunk]]).
  *
  * Why native, and why it needs NO array at all: the composed form
  * (`transform(sequence(…), k -> concat_ws(' ', slice(split(text,' '),
  * k·stride+1, size)))`) materializes the words array, then per chunk
  * runs an interpreted HOF lambda allocating an overlapping slice copy —
  * 10.9 s / 6.98× DuckDB at the ×100 yardstick replica, WORSENING with
  * scale (q97). But because the words are separated by single spaces,
  * the join of CONSECUTIVE words is exactly a SUBSTRING of the original
  * text: this expression scans the text once for word-start offsets and
  * emits each chunk as one substring — no words array, no per-chunk
  * lambda, no reassembly.
  *
  * Word semantics are split-on-0x20 keeping empty segments (consecutive
  * spaces yield empty words that occupy window positions, exactly as the
  * composed slice saw them; CurationSpec pins bit-equality on boundary
  * shapes and the corpus). Null text nulls out. */
case class OverlappingChunks(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {
  require(stride > 0 && size >= stride, "need 0 < stride <= size")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "overlapping_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    OverlappingChunks.chunks(input.asInstanceOf[UTF8String].toString,
      size, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.OverlappingChunks.chunks(" +
        s"$str.toString(), $size, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OverlappingChunks {
  /** Column-level entry point. */
  def apply(text: org.apache.spark.sql.Column, size: Int,
      stride: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      OverlappingChunks(org.apache.spark.sql.GraftShims.expression(text),
        size, stride))

  /** Shared by interpreted eval and generated code. */
  def chunks(text: String, size: Int, stride: Int): GenericArrayData = {
    val n = text.length
    // word i starts at starts(i); nWords = spaces + 1 (split-on-' '
    // keeping every empty segment, leading and trailing included)
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
    val nChunks = (nWords - 1) / stride + 1
    val out = new Array[UTF8String](nChunks)
    var k = 0
    while (k < nChunks) {
      val a = k * stride
      val b = math.min(a + size, nWords) - 1 // last word index of chunk k
      val from = starts(a)
      val to = if (b == nWords - 1) n else starts(b + 1) - 1
      out(k) = UTF8String.fromString(text.substring(from, to))
      k += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }
}
