package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native literal-table scorer for the bigram LM
  * ([[graft.operators.Curation.transitionScores]]'s small-model fast
  * path): per document, ONE pass over the text bytes hashes every bigram
  * slice in place (xxhash64 seed 42, [[BigramHashPairs]]'s gram
  * identity), binary-searches it in the sorted literal (gh → s) model
  * table, and accumulates `(n_bg, tot)` — the same numbers the general
  * plan's explode → hash-join → per-doc aggregation produces, with zero
  * per-occurrence rows, zero join, zero aggregation exchange.
  *
  * This is the [[NearestCentroid]]/classifier literal-table treatment
  * applied to a TRAINED dim: the caller collects the model only under an
  * explicit size guard (the same principle as a broadcast threshold —
  * the general join plan remains the scale path above it). Sum order is
  * document order but irrelevant: the total is an integer sum of longs,
  * overflow-free at any document length that fits memory (max s ~2^45,
  * grams per doc ≪ 2^18).
  *
  * `keys` MUST be sorted ascending (checked at construction). Grams
  * absent from the table are skipped — identical to the inner join's
  * semantics. Null text nulls out; fewer than two words yields (0, 0). */
// Array params make case-class equals/hashCode REFERENCE identity, so two
// semantically equal instances never canonicalize together and each would
// re-ship its model arrays in the plan. Intentional here: the expression
// appears exactly once per q162 plan (the caller builds one instance from
// one collected model), self-equality holds, and content-based equality
// would hash ~4 MB of longs on every canonicalization pass. If a plan ever
// carries two instances, wrap the arrays in a content-equal holder first.
case class BigramMapScore(child: Expression, keys: Array[Long],
    vals: Array[Long]) extends UnaryExpression {
  require(keys.length == vals.length, "keys/vals length mismatch")
  require(keys.length <= 1 || (1 until keys.length)
    .forall(i => keys(i - 1) < keys(i)), "keys must be sorted strictly asc")

  override def dataType: DataType = BigramMapScore.outType
  override def prettyName: String = "bigram_map_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    BigramMapScore.compute(v.asInstanceOf[UTF8String], keys, vals)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // literal tables ride the references array (the centroid pattern) —
    // never inlined into source, so model size can't overflow codegen
    val keysRef = ctx.addReferenceObj("bmsKeys", keys, "long[]")
    val valsRef = ctx.addReferenceObj("bmsVals", vals, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramMapScore.compute($c, $keysRef, $valsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramMapScore {
  private val SEED = 42L // Spark's xxhash64() default seed

  val outType: StructType = StructType(Seq(
    StructField("n_bg", LongType, nullable = false),
    StructField("tot", LongType, nullable = false)))

  def apply(text: org.apache.spark.sql.Column, keys: Array[Long],
      vals: Array[Long]): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      BigramMapScore(org.apache.spark.sql.GraftShims.expression(text),
        keys, vals))

  /** Static kernel (called from generated code and nullSafeEval). */
  def compute(s: UTF8String, keys: Array[Long],
      vals: Array[Long]): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    var numToks = 1
    var p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) numToks += 1
      p += 1
    }
    if (numToks < 2) return InternalRow(0L, 0L)
    val starts = new Array[Int](numToks + 1)
    starts(0) = 0
    var t = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' '.toByte) { starts(t) = p + 1; t += 1 }
      p += 1
    }
    starts(numToks) = len + 1 // sentinel: end(i) = starts(i+1) - 1
    var n = 0L
    var tot = 0L
    var i = 0
    while (i < numToks - 1) {
      val from = starts(i)
      val gh = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
          starts(i + 2) - 1 - from, SEED)
      val idx = java.util.Arrays.binarySearch(keys, gh)
      if (idx >= 0) { n += 1L; tot += vals(idx) }
      i += 1
    }
    InternalRow(n, tot)
  }
}
