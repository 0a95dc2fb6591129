package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: the per-table sign-bit LSH buckets of an
  * `array<float>` embedding against L pinned plane sets, as one
  * `array<long>` — the multi-table sibling of [[CosineSimilarity]] and the
  * ADC literal-table lesson applied to bucketing. The composed form
  * (`array(bucketExpr(t0), …, bucketExpr(tL-1))`) expands to
  * L×planes×dim `element_at` Catalyst nodes — at 10 tables × 3 planes ×
  * 64 dims the generated projection overflows janino's 64 KB method
  * limit and the whole stage silently falls back to interpreted. Here
  * the plane matrices ride along as ONE reference object and the
  * generated code is a fixed triple loop: the index-build scan and the
  * batch-probe projection stay inside WholeStageCodegen at any (L,
  * planes, dim).
  *
  * Bit-compatibility: accumulation is left-to-right over dimensions in
  * double precision — `(double) emb[d] * plane[d]` summed in d-order,
  * bit set iff dot >= 0 — exactly [[graft.operators.Similarity.bucketExpr]]'s
  * fold order, so buckets are bit-identical to the composed form and to
  * the driver-side `queryBucket`, and an index built under either
  * formulation probes correctly under the other.
  */
case class LshBuckets(child: Expression,
    planeSets: Array[Array[Array[Double]]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  // only array<float> buckets correctly: getFloat on an array<double>'s
  // 8-byte slots would silently read garbage halves. Reject at analysis
  // time rather than producing wrong buckets at run time.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.sql}")
  }

  // a ragged (shorter-than-plane) embedding must FAIL LOUDLY, not read
  // past the array: ArrayData.getFloat beyond numElements is an unchecked
  // memory read on unsafe rows — nondeterministic buckets would break the
  // upsert==scratch and probe-routing contracts silently. (The composed
  // element_at form throws under ANSI mode for the same input.)
  private val maxDim: Int =
    planeSets.iterator.flatMap(_.iterator.map(_.length)).max

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    require(emb.numElements() >= maxDim,
      s"embedding has ${emb.numElements()} elements; plane dimension is " +
        s"$maxDim — cannot bucket a ragged vector")
    // a null ELEMENT is as silently corrupting as a ragged vector: the
    // composed form folds it to bit 0, interpreted eval would NPE, and
    // unsafe-row codegen reads 0.0 — three behaviors for one input. One
    // pre-loop per row (not per table×plane) keeps the dot loops flat.
    var nd = 0
    while (nd < maxDim) {
      require(!emb.isNullAt(nd),
        s"embedding element $nd is null — cannot bucket a vector with " +
          "null elements")
      nd += 1
    }
    val out = new Array[Long](planeSets.length)
    var t = 0
    while (t < planeSets.length) {
      val tbl = planeSets(t)
      var b = 0L
      var i = 0
      while (i < tbl.length) {
        val pl = tbl(i)
        var dot = 0.0
        var d = 0
        while (d < pl.length) {
          dot += emb.getFloat(d).toDouble * pl(d)
          d += 1
        }
        if (dot >= 0) b |= (1L << i)
        i += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, emb => {
      val planes = ctx.addReferenceObj("planeSets", planeSets, "double[][][]")
      val out = ctx.freshName("out")
      val tbl = ctx.freshName("tbl")
      val pl = ctx.freshName("pl")
      val b = ctx.freshName("b")
      val dot = ctx.freshName("dot")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |if ($emb.numElements() < $maxDim) {
         |  throw new IllegalArgumentException(
         |    "embedding has " + $emb.numElements() + " elements; plane " +
         |    "dimension is $maxDim - cannot bucket a ragged vector");
         |}
         |for (int $d = 0; $d < $maxDim; $d++) {
         |  if ($emb.isNullAt($d)) {
         |    throw new IllegalArgumentException(
         |      "embedding element " + $d + " is null - cannot bucket a " +
         |      "vector with null elements");
         |  }
         |}
         |long[] $out = new long[${planeSets.length}];
         |for (int $t = 0; $t < ${planeSets.length}; $t++) {
         |  double[][] $tbl = $planes[$t];
         |  long $b = 0L;
         |  for (int $i = 0; $i < $tbl.length; $i++) {
         |    double[] $pl = $tbl[$i];
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $pl.length; $d++) {
         |      $dot += (double) $emb.getFloat($d) * $pl[$d];
         |    }
         |    if ($dot >= 0) $b |= (1L << $i);
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  /** Column-level entry point: `array<long>` of per-table buckets. */
  def apply(emb: Column, planeSets: Seq[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftShims.column(
      LshBuckets(org.apache.spark.sql.GraftShims.expression(emb),
        planeSets.toArray))
}
