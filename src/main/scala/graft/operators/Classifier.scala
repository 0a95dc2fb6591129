package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A linear text classifier TRAINED INSIDE THE ENGINE — the
  * quality/language filter every large-scale training-data pipeline runs
  * (CCNet / fastText-style: hashed bag-of-words features, linear model,
  * score-and-filter), here as a batch perceptron so training and scoring
  * are EXACT INTEGER arithmetic and the whole loop replays in ANSI SQL
  * (the [[BpeTrainer]] oracle discipline — no float summation-order or
  * libm divergence can flip a hash).
  *
  * Features: x_b = count of words whose portable 31-bit polynomial hash
  * ([[Dedup.portableWordHash]]) lands in bucket b — a dense `nF`-long
  * integer array built per row by pure expressions (hash each word once,
  * then nF filter+size passes, all inside whole-stage codegen; no
  * explode, no shuffle). Training: `iters` rounds of the batch
  * perceptron — score = w·x + b under the CURRENT weights, prediction =
  * sign (0 → −1), and the update is the sum of y·x over misclassified
  * rows: ONE map-side-combinable aggregation per round producing nF+1
  * integers, `.head`-read by the driver (the model is a broadcast-sized
  * constant, like IVF centroids or BPE merges).
  *
  * 100 TB shape: per round = one scan + partial aggregation, no shuffle
  * of data rows, driver state nF+1 longs; scoring is a pure expression
  * (deployable in any later filter). Train on a bounded sample at scale —
  * classifier quality needs representative data, not all of it.
  */
object Classifier {

  /** Hashed bag-of-words count features as a dense integer array:
    * element b+1 = #words with portableWordHash % nF == b. Served by the
    * native [[graft.functions.HashedWordCounts]] expression — the
    * composed HOF form (split + per-word char-fold + nF filter/size
    * passes) ran interpreted per lambda and cost ~45 s per corpus pass at
    * the ×10 yardstick replica; the native one-loop form is
    * bit-identical (ClassifierSpec pins it against the composed form)
    * and keeps the scan in WholeStageCodegen. */
  def hashedCounts(text: Column, nF: Int): Column =
    graft.functions.HashedWordCounts(text, nF)

  /** The pre-round-9 composed formulation, kept as the spec's
    * equivalence oracle for the native expression (and as executable
    * documentation of the exact semantics the native form must match). */
  private[graft] def hashedCountsComposed(text: Column, nF: Int): Column = {
    val hs = transform(
      filter(TextFunctions.words(text), w => w =!= ""),
      w => Dedup.portableWordHash(w) % nF)
    array((0 until nF).map(b =>
      size(filter(hs, h => h === b)).cast("long")): _*)
  }

  /** Integer score w·x + b of a feature-array column under literal
    * weights — the deployable scoring expression. */
  def scoreExpr(x: Column, w: Array[Long], b: Long): Column =
    w.zipWithIndex.map { case (wi, i) =>
      element_at(x, i + 1) * lit(wi)
    }.reduceOption[Column](_ + _).getOrElse(lit(0L)) + lit(b)

  /** Sign prediction with the deterministic 0 → −1 convention. */
  def predExpr(score: Column): Column =
    when(score > 0, lit(1L)).otherwise(lit(-1L))

  /** Batch-perceptron training over `feats(y: ±1 long, x: array<long>)`.
    * Returns (weights, bias) after exactly `iters` rounds (fixed-round,
    * never convergence-tested — determinism over early exit). Each round
    * reads one aggregated row; the input is cached for the loop and
    * released after. */
  def trainPerceptron(labeled: DataFrame, textCol: String, labelCol: String,
      nF: Int, iters: Int): (Array[Long], Long) = {
    require(nF > 0 && nF <= 1024, s"nF=$nF out of range (driver holds nF longs)")
    val feats = labeled.select(
      col(labelCol).cast("long").as("y"),
      hashedCounts(col(textCol), nF).as("x")).cache()
    try {
      var w = Array.fill(nF)(0L)
      var b = 0L
      for (_ <- 1 to iters) {
        val mis = feats.filter(
          predExpr(scoreExpr(col("x"), w, b)) =!= col("y"))
        val gradCols = (0 until nF).map(i =>
          coalesce(sum(col("y") * element_at(col("x"), i + 1)), lit(0L))
            .as(s"g$i")) :+
          coalesce(sum(col("y")), lit(0L)).as("gb")
        val r = mis.agg(gradCols.head, gradCols.tail: _*).head // 1 row
        w = w.zipWithIndex.map { case (wi, i) => wi + r.getLong(i) }
        b += r.getLong(nF)
      }
      (w, b)
    } finally feats.unpersist()
  }
}
