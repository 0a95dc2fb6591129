package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per document, one `(gh, w1h)` long pair per
  * word BIGRAM — `gh` = xxhash64 (seed 42) of the bigram's contiguous byte
  * slice (bit-identical to `xxhash64(gram_string)` because a single-space
  * bigram IS a slice of the text, [[WordNgrams]]'s identity), `w1h` =
  * xxhash64 of the first word's slice (bit-identical to
  * `xxhash64(substring_index(g, " ", 1))`). Output
  * `array<struct<gh:long, w1h:long>>`, exploded once downstream.
  *
  * Why ([[graft.operators.Curation.transitionScores]], q162 — the round-9
  * verdict's #3): the bigram-LM corpus pass needs BOTH hashes per gram, so
  * the composed form paid, per gram, a gram UTF8String (from the
  * [[WordNgrams]] array), a `substring_index` first-word string, and two
  * string-input hash evaluations — per-row object churn that kept q162 at
  * 2.68× DuckDB at ×100 with tiny exchanges and declining-slope-free
  * residuals (PERF.md r9: three plan rewrites measured worse; the strings
  * were the cost, not the plan). Here each hash runs IN PLACE over the
  * text's own bytes and word boundaries are scanned once per document; the
  * only per-gram allocation is the 2-long struct row the explode consumes.
  * Downstream hash-space arithmetic is unchanged (byte-identical keys, so
  * the q162 oracle pins the whole rewrite).
  *
  * Word semantics are [[WordNgrams]]'s exactly: split on single 0x20,
  * empty tokens kept (hashing their empty slice, as xxhash64('') does).
  * Null text nulls out; fewer than two words yields an empty array. */
case class BigramHashPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BigramHashPairs.outType
  override def prettyName: String = "bigram_hash_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    BigramHashPairs.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramHashPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramHashPairs {
  private val SEED = 42L // Spark's xxhash64() default seed

  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("gh", LongType, nullable = false),
    StructField("w1h", LongType, nullable = false))), containsNull = false)

  def apply(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      BigramHashPairs(org.apache.spark.sql.GraftShims.expression(text)))

  /** Static kernel (called from generated code and nullSafeEval). */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var numToks = 1
    var p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) numToks += 1
      p += 1
    }
    if (numToks < 2)
      return new GenericArrayData(Array.empty[InternalRow])
    val starts = new Array[Int](numToks + 1)
    starts(0) = 0
    var t = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(numToks) = len + 1 // sentinel: end(i) = starts(i+1) - 1
    val out = new Array[InternalRow](numToks - 1)
    var i = 0
    while (i < numToks - 1) {
      val from = starts(i)
      val gh = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
          starts(i + 2) - 1 - from, SEED)
      val w1h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
          starts(i + 1) - 1 - from, SEED)
      out(i) = InternalRow(gh, w1h)
      i += 1
    }
    new GenericArrayData(out)
  }
}
