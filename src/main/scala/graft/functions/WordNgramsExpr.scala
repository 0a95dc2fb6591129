package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram shingling: text → array of space-joined n-grams.
  * Produces exactly the same strings as the composed
  * `transform(sequence(...), i -> concat_ws(" ", ws[i..i+n-1]))` form
  * (split on a single space, trailing empties kept) but in one byte-level
  * loop — the composed higher-order functions are interpreted per element
  * and dominated the dedup pipeline's profile (~20 µs per shingle).
  *
  * Two properties make the fast path possible:
  * - 0x20 never occurs inside a UTF-8 multi-byte sequence, so token
  *   boundaries are found by scanning RAW BYTES — no decode;
  * - the join separator equals the split separator, so every n-gram is a
  *   contiguous BYTE SLICE of the input (`fromBytes` view, zero re-encode).
  * `doGenCode` emits a call to the static [[WordNgrams.compute]] so the
  * expression stays inside whole-stage codegen instead of the
  * CodegenFallback eval path (shingling feeds every dedup/contamination
  * query's first stage — this is the hot loop of the corpus pipeline).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    WordNgrams.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  def apply(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftShims.column(
      WordNgrams(org.apache.spark.sql.GraftShims.expression(text), n))

  /** Static n-gram kernel (called from generated code and nullSafeEval).
    * Semantics are bit-identical to
    * `toString.split(" ", -1)` + space-join: empty tokens from leading /
    * trailing / doubled spaces are kept. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token i spans [starts(i), ends(i)); single-space separators mean
    // gram i is the byte slice [starts(i), ends(i + n - 1))
    var numToks = 1
    var p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) numToks += 1
      p += 1
    }
    if (numToks < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](numToks + 1)
    starts(0) = 0
    var t = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(numToks) = len + 1 // sentinel: end(i) = starts(i+1) - 1
    val out = new Array[Any](numToks - n + 1)
    var i = 0
    while (i <= numToks - n) {
      val from = starts(i)
      val until = starts(i + n) - 1
      out(i) = UTF8String.fromBytes(bytes, from, until - from)
      i += 1
    }
    new GenericArrayData(out)
  }
}
