package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: the max-dot centroid id of an `array<float>`
  * vector against a pinned centroid matrix — the IVF coarse-quantizer
  * assignment ([[graft.operators.Similarity.nearestListExpr]]), third member
  * of the [[LshBuckets]]/[[PqEncode]] literal-table family. The composed
  * form (`greatest(struct(dot, i) …)` with each dot inlined as dim
  * element_at terms) expands to nLists × dim Catalyst nodes — at the IVF
  * default (8 lists × 64 dims) the generated projection overflows janino
  * and the assignment scan (q62 probe, every index build that calls
  * ivfAssign, the k-means listMeans aggregate) silently drops to
  * interpreted eval. Here the centroid matrix rides along as ONE reference
  * object and the generated code is a fixed double loop.
  *
  * Bit-compatibility with the composed form (property-tested):
  * - the dot is accumulated left-to-right in d-order SEEDED WITH THE FIRST
  *   PRODUCT, exactly like `dotLit`'s reduce (value parity on the
  *   signed-zero edge: an all-products-negative-zero dot stays -0.0);
  * - the winner is `greatest(struct(dot, i))` under SPARK's double
  *   ordering (SQLOrderingUtil.compareDoubles: -0.0 == +0.0, NaN == NaN,
  *   NaN greater than everything): maximum dot, ties to the HIGHEST
  *   centroid id — replicated by an ascending scan keeping
  *   `s == best || compare(s, best) >= 0` (the `s == best` disjunct makes
  *   a -0.0/+0.0 pair a TIE, where bare Double.compare would rank +0.0
  *   strictly above and pin the argmax to the +0.0 member regardless of
  *   index — the zero vector against a mix of negative-leading and
  *   positive-leading centroids hits exactly that).
  * So list assignments, partition layouts, and every IVF oracle hash are
  * unchanged, and an index assigned under either formulation probes
  * correctly under the other. */
case class NearestCentroid(child: Expression,
    cents: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  // only array<float> assigns correctly (the LshBuckets rationale: getFloat
  // on an array<double>'s 8-byte slots silently reads garbage halves)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${other.sql}")
  }

  private val dim: Int = cents(0).length

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    // ragged or null-element vectors fail loudly (the composed element_at
    // form throws under ANSI mode; unsafe-row getFloat past the end or on
    // a null slot is a silent wrong-assignment instead)
    require(emb.numElements() >= dim,
      s"embedding has ${emb.numElements()} elements; centroid dimension " +
        s"is $dim — cannot assign a ragged vector")
    var nd = 0
    while (nd < dim) {
      require(!emb.isNullAt(nd),
        s"embedding element $nd is null — cannot assign a vector with " +
          "null elements")
      nd += 1
    }
    var best = 0.0
    var bi = 0
    var c = 0
    while (c < cents.length) {
      val cw = cents(c)
      var s = emb.getFloat(0).toDouble * cw(0)
      var d = 1
      while (d < dim) {
        s += emb.getFloat(d).toDouble * cw(d)
        d += 1
      }
      if (c == 0 || s == best || java.lang.Double.compare(s, best) >= 0) {
        best = s; bi = c
      }
      c += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, emb => {
      val cs = ctx.addReferenceObj("cents", cents, "double[][]")
      val cw = ctx.freshName("cw")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |if ($emb.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "embedding has " + $emb.numElements() + " elements; centroid " +
         |    "dimension is $dim - cannot assign a ragged vector");
         |}
         |for (int $d = 0; $d < $dim; $d++) {
         |  if ($emb.isNullAt($d)) {
         |    throw new IllegalArgumentException(
         |      "embedding element " + $d + " is null - cannot assign a " +
         |      "vector with null elements");
         |  }
         |}
         |double $best = 0.0;
         |int $bi = 0;
         |for (int $c = 0; $c < ${cents.length}; $c++) {
         |  double[] $cw = $cs[$c];
         |  double $s = (double) $emb.getFloat(0) * $cw[0];
         |  for (int $d = 1; $d < $dim; $d++) {
         |    $s += (double) $emb.getFloat($d) * $cw[$d];
         |  }
         |  if ($c == 0 || $s == $best ||
         |      java.lang.Double.compare($s, $best) >= 0) {
         |    $best = $s; $bi = $c;
         |  }
         |}
         |${ev.value} = $bi;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-level entry point: integer centroid/list id. */
  def apply(emb: Column, cents: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftShims.column(
      NearestCentroid(org.apache.spark.sql.GraftShims.expression(emb), cents))
}
