package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second-wave operator coverage: sessionization (gap-based), statistical
  * aggregates, JSON scalar surface (F21/F22), map functions (F20).
  */
object AdvancedQueries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  /** q27: gap-based sessionization (30-min inactivity) — lag window + count
    * of session starts, the batch form of the streaming session-window
    * operator. One shuffle on user_id. */
  private def q27(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  private val q27Sql =
    """WITH o AS (SELECT user_id, event_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |           FROM events)
      |SELECT user_id,
      |  CAST(count(*) FILTER (prev IS NULL OR ts - prev > INTERVAL 30 MINUTE) AS BIGINT)
      |    AS n_sessions,
      |  count(*) AS n_events
      |FROM o GROUP BY user_id""".stripMargin

  /** q28: statistical aggregates — sample stddev, exact interpolated median,
    * Pearson correlation. */
  private def q28(s: SparkSession, d: String): DataFrame =
    li(s, d).groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 2).as("median_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"))

  private val q28Sql =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
      |  round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
      |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q29: JSON parse of the event props payload (F22) + agg over the
    * extracted field. */
  private def q29(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        sum(col("k")).cast("long").as("k_sum"),
        round(avg(col("k")), 4).as("k_avg"))

  private val q29Sql =
    """SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
      |  round(avg(k), 4) AS k_avg
      |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** q44: approx distinct (HLL sketch, SURVEY §2.5 A6 scale path) alongside
    * the exact count — rows-only for the sketch (engine-specific estimate),
    * but the exact column keeps the query oracle-comparable... split: exact
    * only in the oracle-facing projection. */
  private def q44(s: SparkSession, d: String): DataFrame =
    li(s, d).agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))

  val all: Seq[QueryDef] = Seq(
    QueryDef("q27_sessionize", q27, Some(q27Sql), bench = true),
    QueryDef("q28_stats_agg", q28, Some(q28Sql)),
    QueryDef("q29_json_extract", q29, Some(q29Sql)),
    QueryDef("q44_approx_distinct", q44, None))
}
