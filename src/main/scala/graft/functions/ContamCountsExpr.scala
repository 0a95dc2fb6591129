package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native literal-table contamination scorer
  * ([[graft.operators.Curation.contaminationCounts]]'s bounded-eval fast
  * path, q90/q139): per training document, ONE pass hashes every word
  * n-gram slice in place ([[WordNgramHashes]]'s gram identity), dedups the
  * doc's hashes, and counts `(n_sh, n_contam)` — distinct shingles and how
  * many of them binary-search into the sorted literal eval-shingle hash
  * set. The same numbers the explode → broadcast-join → per-doc
  * aggregation plan produces, with zero per-occurrence rows, zero join,
  * zero aggregation exchange.
  *
  * Why: the ×1000 rehearsal measured the string-keyed broadcast-probe
  * plan RISING against DuckDB (2.67× at ×100 → 3.41× at ×1000,
  * bench/r11/) — ~430 M gram-string UTF8 views hashed per corpus pass
  * against a string-keyed broadcast map, pure per-gram object churn (the
  * q162/q65 lesson on the contamination axis). Eval suites are bounded by
  * CONSTRUCTION (fixed benchmarks — their distinct shingles don't grow
  * with corpus replication), so the caller collects the eval hash set
  * under an explicit size guard, exactly the
  * [[graft.operators.Curation.transitionScores]] literal-model principle;
  * the hash-space broadcast-join plan remains the path above the guard.
  *
  * `evalHashes` MUST be sorted strictly ascending (checked at
  * construction). Hash-space equality is byte-identical to string
  * equality modulo 2^-64 collisions (the crossDocDupCounts recipe,
  * oracle-pinned). Null text nulls out; fewer than n words yields (0, 0)
  * — callers filter n_sh > 0 to mirror the join plan's explode dropping
  * shingle-less docs. */
// Array param ⇒ case-class equals is reference identity (the BigramMapScore
// note): intentional — one instance per plan, built from one collected set.
case class ContamCounts(child: Expression, evalHashes: Array[Long], n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size n=$n out of range")
  require(evalHashes.length <= 1 || (1 until evalHashes.length)
    .forall(i => evalHashes(i - 1) < evalHashes(i)),
    "evalHashes must be sorted strictly ascending")

  override def dataType: DataType = ContamCounts.outType
  override def prettyName: String = "contam_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    ContamCounts.compute(v.asInstanceOf[UTF8String], evalHashes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the literal table rides the references array (the centroid pattern)
    val evalRef = ctx.addReferenceObj("contamEval", evalHashes, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ContamCounts.compute($c, $evalRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ContamCounts {
  val outType: StructType = StructType(Seq(
    StructField("n_sh", LongType, nullable = false),
    StructField("n_contam", LongType, nullable = false)))

  def apply(text: org.apache.spark.sql.Column, evalHashes: Array[Long],
      n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      ContamCounts(org.apache.spark.sql.GraftShims.expression(text),
        evalHashes, n))

  /** Static kernel (generated code and nullSafeEval both land here). */
  def compute(s: UTF8String, eval: Array[Long], n: Int): InternalRow = {
    val hs = WordNgramHashes.compute(s, n)
    val m = hs.numElements()
    if (m == 0) return InternalRow(0L, 0L)
    val a = new Array[Long](m)
    var i = 0
    while (i < m) { a(i) = hs.getLong(i); i += 1 }
    java.util.Arrays.sort(a)
    var nSh = 0L
    var nContam = 0L
    i = 0
    while (i < m) {
      if (i == 0 || a(i) != a(i - 1)) {
        nSh += 1
        if (java.util.Arrays.binarySearch(eval, a(i)) >= 0) nContam += 1
      }
      i += 1
    }
    InternalRow(nSh, nContam)
  }
}
