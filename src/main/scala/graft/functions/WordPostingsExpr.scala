package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document postings: text → array of
  * (word, tf, sorted positions) structs, one per DISTINCT token.
  *
  * Produces exactly the rows the composed
  * `posexplode(split(text, " ")) → groupBy(word, doc).agg(count,
  * sort_array(collect_list(pos)))` pipeline produces for one document
  * (split on a single space, trailing empties kept, 0-based positions,
  * positions ascending) — but in one byte-level scan of the text with NO
  * aggregation and therefore NO exchange: a document's text lives in one
  * row, so the per-(word, doc) groupBy the composed form pays is a full
  * corpus shuffle that merges nothing (r12 ×10 gate: the postings-build
  * Exchange was every inline FTS query's dominant stage). The caller
  * (`Fts.positionalPostings`) just explodes the struct array.
  *
  * Tokenization is bit-identical to `split(text, " ")`: 0x20 never occurs
  * inside a UTF-8 multi-byte sequence, so token boundaries are found by
  * scanning raw bytes (the [[WordNgrams]] property), and each word is a
  * contiguous byte slice of the input (no decode, no re-encode).
  * Positions are appended in scan order, so each list is ascending — equal
  * to the composed form's `sort_array`. `doGenCode` emits a call to the
  * static [[WordPostings.compute]] so the expression stays inside
  * whole-stage codegen rather than the CodegenFallback eval path.
  */
case class WordPostings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WordPostings.outType
  override def prettyName: String = "word_postings"

  override def nullSafeEval(v: Any): Any =
    WordPostings.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPostings.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPostings {
  val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("word", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("positions", ArrayType(IntegerType, containsNull = false),
        nullable = false))),
    containsNull = false)

  def apply(text: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      WordPostings(org.apache.spark.sql.GraftShims.expression(text)))

  /** Static kernel (called from generated code and nullSafeEval). One
    * entry per distinct token, first-occurrence order; tf = occurrence
    * count; positions = ascending 0-based token indices. Empty tokens
    * (leading / trailing / doubled spaces; "" for empty text) are real
    * tokens, exactly as in `split(text, " ")`. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var numToks = 1
    var p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) numToks += 1
      p += 1
    }
    // token i spans [starts(i), starts(i+1) - 1); sentinel makes the last
    // token's end fall at len
    val starts = new Array[Int](numToks + 1)
    starts(0) = 0
    var t = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(numToks) = len + 1
    // slot per distinct word; per-slot growable int buffer of positions
    val slotOf = new java.util.HashMap[UTF8String, Integer](numToks * 2)
    var words = new Array[UTF8String](16)
    var bufs = new Array[Array[Int]](16)
    var lens = new Array[Int](16)
    var nWords = 0
    var i = 0
    while (i < numToks) {
      val from = starts(i)
      val until = starts(i + 1) - 1
      val w = UTF8String.fromBytes(bytes, from, until - from)
      var slot = slotOf.get(w)
      if (slot == null) {
        if (nWords == words.length) {
          words = java.util.Arrays.copyOf(words, nWords * 2)
          bufs = java.util.Arrays.copyOf(bufs, nWords * 2)
          lens = java.util.Arrays.copyOf(lens, nWords * 2)
        }
        slotOf.put(w, nWords)
        words(nWords) = w
        bufs(nWords) = new Array[Int](4)
        slot = nWords
        nWords += 1
      }
      val sl = slot.intValue()
      if (lens(sl) == bufs(sl).length)
        bufs(sl) = java.util.Arrays.copyOf(bufs(sl), lens(sl) * 2)
      bufs(sl)(lens(sl)) = i
      lens(sl) += 1
      i += 1
    }
    val out = new Array[Any](nWords)
    var j = 0
    while (j < nWords) {
      out(j) = InternalRow(
        words(j), lens(j).toLong,
        new GenericArrayData(java.util.Arrays.copyOf(bufs(j), lens(j))))
      j += 1
    }
    new GenericArrayData(out)
  }
}
