package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the xxhash64 (seed 42 — Spark's
  * `xxhash64()` default) of every word n-gram of a document, as one
  * `array<long>` — bit-identical to
  * `transform(WordNgrams(text, n), g -> xxhash64(g))` because each gram
  * is a contiguous byte slice of the text ([[WordNgrams]]'s identity), so
  * the hash runs IN PLACE over the text's own bytes: no gram UTF8String
  * objects, no per-gram array cells of strings, no separate hash
  * expression evaluation, and the explode downstream moves primitive
  * longs instead of string views.
  *
  * Why: the bigram LM hot path ([[graft.operators.Curation.transitionScores]],
  * q162) hashes ~50 M grams per corpus pass at the ×100 yardstick replica
  * — the gram-string formulation measured 20-24 s there (4.2× DuckDB),
  * with every exchange tiny and all joins broadcast: pure per-gram object
  * churn. Hash-space arithmetic downstream is unchanged (the
  * crossDocDupCounts recipe: byte-identical results modulo 2^-64
  * collisions, pinned by the q162 oracle).
  *
  * Word semantics are [[WordNgrams]]'s exactly: split on single 0x20,
  * leading/trailing/doubled-space empty tokens kept (an empty token
  * hashes its empty slice, as xxhash64('') does). Null text nulls out;
  * fewer than n words yields an empty array. */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    WordNgramHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgramHashes {
  private val SEED = 42L // Spark's xxhash64() default seed

  def apply(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      WordNgramHashes(org.apache.spark.sql.GraftShims.expression(text), n))

  /** Static kernel (called from generated code and nullSafeEval). */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var numToks = 1
    var p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) numToks += 1
      p += 1
    }
    if (numToks < n) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](numToks + 1)
    starts(0) = 0
    var t = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(numToks) = len + 1 // sentinel: end(i) = starts(i+1) - 1
    val out = new Array[Long](numToks - n + 1)
    var i = 0
    while (i <= numToks - n) {
      val from = starts(i)
      val until = starts(i + n) - 1
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
          until - from, SEED)
      i += 1
    }
    new GenericArrayData(out)
  }
}
