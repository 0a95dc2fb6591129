package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY.md §2.11 ST7, declared out of the reference's
  * scope but part of the engine surface): attribution-style interval join —
  * each purchase matched to the views by the same user within the preceding
  * `horizon`. Both sides are watermarked, and the join condition bounds event
  * time on both sides, so Spark can evict state: view state is kept only
  * `horizon + watermark` past its event time. One shuffle on user_id per
  * side; state is range-pruned, not unbounded.
  */
object StreamJoins {

  /** views/purchases: streaming DataFrames with (event_id, ts, user_id).
    * Returns (purchase_id, view_id, user_id, view_ts, purchase_ts). */
  def viewPurchaseAttribution(views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
      col("v_user") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"),
      "inner")
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("view_ts"), col("purchase_ts"))
  }
}
