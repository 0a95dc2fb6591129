package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: the PQ code vector of an `array<float>`
  * embedding under pinned per-subspace codebooks — the [[LshBuckets]]
  * lesson applied to product-quantization encoding. The composed form
  * (`array(greatest(struct(dot − ‖c‖²/2, i) …) …)`) expands to
  * m × k × subDim `element_at` nodes plus m × k struct comparisons — at
  * m=8, k=16, dim=64 the generated projection overflows janino
  * (`Failed to compile` → the whole stage, index build INCLUDED, silently
  * falls back to interpreted eval; measured on q150/q151/q154/q158).
  * Here the codebooks ride along as one reference object and the
  * generated code is a fixed triple loop — encode stays inside
  * WholeStageCodegen at any (m, k, dim).
  *
  * Bit-compatibility with [[graft.operators.Pq.encodeExpr]]'s composed
  * form (property-tested): per subspace j and codeword c the score is
  * `Σ_d ((double) emb[j·subDim+d] / norm) · c[d] − ‖c‖²/2` accumulated
  * left-to-right in d-order seeded by the FIRST product (the dotNormAt
  * fold order — a 0.0 seed would flip a -0.0 subspace sum to +0.0), and
  * the winner is the `greatest(struct(score, i))` rule under SPARK's
  * double ordering (SQLOrderingUtil.compareDoubles: -0.0 == +0.0, NaN ==
  * NaN, NaN greater than everything) — maximum score, ties to the
  * HIGHEST code index — so codes, stored indexes, and every oracle hash
  * are unchanged, and an index encoded under either formulation probes
  * correctly under the other. */
case class PqEncode(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // only array<float> encodes correctly (the LshBuckets rationale:
  // getFloat on 8-byte slots reads garbage halves); norm must be the
  // hoisted vecNorm double
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, double), got (${l.sql}, ${r.sql})")
    }

  private val m: Int = books.length
  private val subDim: Int = books(0)(0).length
  private val dim: Int = m * subDim
  // ‖c‖²/2 per (subspace, code), precomputed exactly as the composed
  // form's literal (Scala left-to-right sum)
  private val halfSq: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum / 2))

  override def nullSafeEval(embAny: Any, normAny: Any): Any = {
    val emb = embAny.asInstanceOf[ArrayData]
    val norm = normAny.asInstanceOf[Double]
    require(emb.numElements() >= dim,
      s"embedding has ${emb.numElements()} elements; codebooks cover " +
        s"$dim — cannot encode a ragged vector")
    var nd = 0
    while (nd < dim) {
      require(!emb.isNullAt(nd),
        s"embedding element $nd is null — cannot encode a vector with " +
          "null elements")
      nd += 1
    }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val hs = halfSq(j)
      var best = Double.NegativeInfinity
      var bi = 0
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        // seed with the FIRST product, not 0.0 — the composed reduce's
        // left fold starts at term 0, and a 0.0 seed flips a -0.0 subspace
        // sum to +0.0 (the NearestCentroid signed-zero rule)
        var s = emb.getFloat(j * subDim).toDouble / norm * cw(0)
        var d = 1
        while (d < subDim) {
          s += emb.getFloat(j * subDim + d).toDouble / norm * cw(d)
          d += 1
        }
        s -= hs(c)
        // ascending scan + >= replicates greatest(struct(score, i)) under
        // SPARK's double ordering (SQLOrderingUtil.compareDoubles): the
        // `s == best` disjunct makes -0.0 == +0.0 a TIE (→ highest code
        // index), where bare Double.compare would rank +0.0 above -0.0;
        // NaN==NaN and NaN-greatest come from Double.compare as before
        if (s == best || java.lang.Double.compare(s, best) >= 0) {
          best = s; bi = c
        }
        c += 1
      }
      out(j) = bi
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (emb, norm) => {
      val bks = ctx.addReferenceObj("books", books, "double[][][]")
      val hsq = ctx.addReferenceObj("halfSq", halfSq, "double[][]")
      val out = ctx.freshName("out")
      val book = ctx.freshName("book")
      val hs = ctx.freshName("hs")
      val cw = ctx.freshName("cw")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |if ($emb.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "embedding has " + $emb.numElements() + " elements; " +
         |    "codebooks cover $dim - cannot encode a ragged vector");
         |}
         |for (int $d = 0; $d < $dim; $d++) {
         |  if ($emb.isNullAt($d)) {
         |    throw new IllegalArgumentException(
         |      "embedding element " + $d + " is null - cannot encode a " +
         |      "vector with null elements");
         |  }
         |}
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double[][] $book = $bks[$j];
         |  double[] $hs = $hsq[$j];
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bi = 0;
         |  for (int $c = 0; $c < $book.length; $c++) {
         |    double[] $cw = $book[$c];
         |    double $s = (double) $emb.getFloat($j * $subDim) / $norm * $cw[0];
         |    for (int $d = 1; $d < $subDim; $d++) {
         |      $s += (double) $emb.getFloat($j * $subDim + $d) / $norm * $cw[$d];
         |    }
         |    $s -= $hs[$c];
         |    if ($s == $best || java.lang.Double.compare($s, $best) >= 0) {
         |      $best = $s; $bi = $c;
         |    }
         |  }
         |  $out[$j] = $bi;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Column-level entry point: `array<int>` of per-subspace code ids. */
  def apply(emb: Column, norm: Column,
      books: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftShims.column(
      PqEncode(org.apache.spark.sql.GraftShims.expression(emb),
        org.apache.spark.sql.GraftShims.expression(norm), books))
}
