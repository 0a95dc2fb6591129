package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared judge for a Misra-Gries sketch against exact counts — the
  * q131/q138 contract in one place so the batch and streaming variants
  * cannot diverge: every key with true count > n/(k+1) must be present in
  * the sketch, no estimate exceeds truth, every undercount is ≤ n/(k+1).
  * These guarantees are merge-order-free, which is what makes the same
  * contract sound for both a batch aggregate and a streaming drain.
  */
object SketchContract {

  /** One contract row. `sketch`: (w, est) with ≤ k rows (broadcast-safe by
    * construction); `exact`: (w, cnt) ground truth. Output columns:
    * (<distinctName>, <totalName>, n_heavy, all_heavy_present,
    * never_overestimates, within_bound) — n_heavy and the totals are exact
    * values on both engines, the booleans must all be true. */
  def misraGries(sketch: DataFrame, exact: DataFrame, k: Int,
      distinctName: String, totalName: String): DataFrame = {
    val tot = exact.agg(sum(col("cnt")).cast("long").as(totalName))
    exact.join(broadcast(sketch), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("thr", expr(s"$totalName div ${k + 1}"))
      .agg(
        count(lit(1)).as(distinctName),
        max(col(totalName)).as(totalName),
        coalesce(sum(when(col("cnt") > col("thr"), 1)), lit(0))
          .cast("long").as("n_heavy"),
        (coalesce(sum(when(col("cnt") > col("thr") && col("est").isNull, 1)),
          lit(0)) === 0).as("all_heavy_present"),
        (coalesce(sum(when(col("est") > col("cnt"), 1)), lit(0)) === 0)
          .as("never_overestimates"),
        (coalesce(sum(when(col("est").isNotNull &&
          col("cnt") - col("est") > col("thr"), 1)), lit(0)) === 0)
          .as("within_bound"))
  }
}
