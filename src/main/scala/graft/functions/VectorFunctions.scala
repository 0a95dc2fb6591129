package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns (SURVEY.md §2.9 L2), built
  * from codegen'd higher-order functions — no UDF, no collect. Accumulation
  * is an explicit left fold in double precision so results are bit-identical
  * to the DuckDB oracle's `list_sum(list_transform(...))` form.
  *
  * At 100 TB the brute-force top-k is `TakeOrderedAndProject` (per-partition
  * heap + driver merge of k rows, never a global sort); the LSH-bucketed
  * variant in operators/Similarity narrows candidates first.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision, sequential left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ with the same fold shape (sqrt of a sequential sum of squares). */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity: dot/(‖a‖·‖b‖) — expression shape mirrors the oracle
    * exactly (dot / (na * nb)) so doubles match without tolerance. NULL on
    * zero-norm inputs (explicit guard: Spark 4's ANSI mode would otherwise
    * raise DIVIDE_BY_ZERO where DuckDB and the native expression yield NULL)
    * and on length-mismatched inputs (zip_with pads with NULL → NULL dot). */
  def cosineSim(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom =!= lit(0.0), dot(a, b) / denom)
  }
}
