package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for shuffle joins (the 100 TB design note in
  * PERF.md made operational). AQE's skew-join split handles most skew at
  * runtime, but two cases still need manual salting: (a) stateful/streaming
  * joins where AQE is disabled, and (b) a single hot key so large that even
  * split partitions of it overwhelm one task's build side.
  *
  * Salting trades a `saltFactor`× replication of the (small but not
  * broadcast-small) right side for an even spread of the hot left keys:
  * left rows get a random salt in [0, saltFactor); right rows are replicated
  * once per salt value; the join key becomes (key, salt). Equi-join results
  * are identical to the unsalted join — verified by SkewJoinSpec.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `keys`, salted `saltFactor`
    * ways. The left salt is uniform rand — WHICH salt a row gets never
    * affects the result (the right side carries every salt value), it only
    * spreads a hot key across saltFactor reducers, so rand's
    * retry-instability is harmless here.
    *
    * Broadcast guard (the round-11 lesson): salting exists to spread
    * REDUCER skew, and a broadcast-hash join has no reducers — salting a
    * broadcast-sized right side replicates the build `saltFactor`× and
    * pays a rand per fact row for zero benefit (r11 measured 34.9× DuckDB
    * at ×1000 for exactly that). When the right side's optimized-plan size
    * estimate is at or under `spark.sql.autoBroadcastJoinThreshold`, this
    * degrades to the plain join and lets the planner broadcast it. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, seed: Long = 42L): DataFrame = {
    require(saltFactor > 0)
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedInnerJoin reserves the __salt column name")
    if (rightIsBroadcastable(right)) return left.join(right, keys)
    val l = left.withColumn("__salt", (rand(seed) * saltFactor).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** True when the planner would broadcast `right` anyway (plan size
    * estimate ≤ autoBroadcastJoinThreshold > 0). Conservative on purpose:
    * parquet size estimates overshoot in-memory size, so this only no-ops
    * the clearly-broadcastable case. */
  private[graft] def rightIsBroadcastable(right: DataFrame): Boolean = {
    val raw = right.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val threshold =
      try raw.toLong
      catch {
        case _: NumberFormatException =>
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      }
    threshold > 0 &&
      right.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
  }

  /** Skewed-key isolation: route rows whose key is in `hotKeys` through a
    * broadcast join (hot keys are few by definition, so their dim rows fit
    * in a broadcast), everything else through the normal shuffle join; union
    * the results. This is the classic two-path plan for power-law keys —
    * the shuffle join never sees the hot keys, so no task drowns. */
  def hotKeySplitJoin(left: DataFrame, right: DataFrame, key: String,
      hotKeys: Seq[Any]): DataFrame = {
    if (hotKeys.isEmpty) return left.join(right, Seq(key))
    val hotL = left.filter(col(key).isin(hotKeys: _*))
    val coldL = left.filter(!col(key).isin(hotKeys: _*) || col(key).isNull)
    val hotR = right.filter(col(key).isin(hotKeys: _*))
    hotL.join(broadcast(hotR), Seq(key))
      .unionByName(coldL.join(right, Seq(key)))
  }

  /** Detect skewed keys: keys holding more than `threshold` of the rows
    * (single aggregation pass; intended for the driver to feed
    * hotKeySplitJoin or to pick a saltFactor). */
  def skewedKeys(df: DataFrame, key: String, threshold: Double): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(threshold * total))
      .select(col(key), col("n"))
  }
}
