package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage (SURVEY.md §2.3–§2.7): scans, projections,
  * filters, all join flavors, hash aggregates, windows, top-k, rollup, set
  * ops, dedup. Every query is declarative DataFrame API so Catalyst gets
  * predicate pushdown / column pruning / broadcast selection for free; at
  * 100 TB the same plans hold (dims broadcast, facts hash-shuffle on join
  * keys, top-k runs as TakeOrderedAndProject without a global sort).
  */
object RelationalQueries {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def sup(s: SparkSession, d: String) = Tables.supplier(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def reg(s: SparkSession, d: String) = Tables.region(s, d)
  private def prt(s: SparkSession, d: String) = Tables.part(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** q01: TPC-H Q1-shaped pricing summary — partial+final hash aggregate on
    * low-cardinality keys; the canonical map-side-combine scan agg. */
  private def q01(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").cast("long").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q02: TPC-H Q6-shaped selective scan agg — predicate pushdown to parquet,
    * no shuffle at all (single global agg). */
  private def q02(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  private val q02Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** q03: TPC-H Q3-shaped 3-way join + agg + top-k. Orders/lineitem shuffle
    * on orderkey; top-k is TakeOrderedAndProject (no global sort); ordering
    * is on the rounded revenue with a unique key tiebreak so the oracle
    * agrees bit-for-bit. */
  private def q03(s: SparkSession, d: String): DataFrame =
    cust(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(ord(s, d), col("c_custkey") === col("o_custkey"))
      .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  private val q03Sql =
    """SELECT o_orderkey, o_orderdate,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** q04: existence semi-join (TPC-H Q4 shape) — left_semi avoids
    * materializing the many-row probe side. */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    val l = li(s, d)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** q05: TPC-H Q5-shaped 6-way join — the region predicate is resolved to
    * the 5 ASIA nations first (region ⋈ nation, two broadcast dims), and
    * that 5-row dim joins CUSTOMER before any fact is touched: the customer
    * slice shrinks 5×, so every downstream fact join (orders, lineitem)
    * carries only the qualifying region's rows — at 100 TB the orderkey
    * shuffle moves a fifth of the data that the filter-after-join ordering
    * would. The c_nationkey = s_nationkey condition then pins supplier to
    * the customer's nation; supplier is left unhinted — AQE broadcasts it
    * at bench scale, while at cluster scale (supplier ~fact/10⁴, possibly
    * over the broadcast budget) the planner is free to shuffle it. */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val asiaNat = nat(s, d)
      .join(broadcast(reg(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    cust(s, d)
      .join(broadcast(asiaNat), col("c_nationkey") === col("n_nationkey"))
      .join(ord(s, d), col("c_custkey") === col("o_custkey"))
      .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(sup(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
  }

  private val q05Sql =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  /** q06: broadcast dim chain — revenue per region; both dims broadcast, fact
    * shuffles once for the final agg. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    // Join ORDER is declared dims-first: Spark executes joins as written
    // (CBO join reorder is off by default), so a fact-first declaration
    // (li ⋈ ord, then customer) runs the 600 M × 150 M exchange BEFORE
    // any selectivity applies — at the dim-skewed ×1000 replica (customer
    // ×10 only) that plan sorts 600 M rows to keep 1 %. Dims-first, the
    // orders⋈customer⋈nation⋈region subtree reduces to the surviving
    // orders and the lineitem join probes it — and with a small build
    // side, Spark's runtime bloom filter / AQE can prune the fact scan
    // pre-exchange. Inner joins commute, so the row set (and the flat
    // double revenue sum over it) is unchanged at every scale.
    // (Measured-worse alternative, bench/r11/: a per-orderkey decimal
    // pre-agg read 118 s vs 99 s at ×1000 — replication scatters each
    // order's lineitems, so the partial agg pays the full 600 M exchange
    // plus wide decimal buffers for no reduction.)
    ord(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("o_orderkey"), col("r_name"))
      .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("r_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q182: q06 declared FACT-FIRST and unhinted — the naive formulation a
    * user actually writes (`lineitem.join(orders).join(customer)...`),
    * regression-gating [[graft.plans.DimsFirstJoinReorder]]: without the
    * rule this declaration runs the lineitem⋈orders exchange before any
    * dim reduces (the r11-measured 5× cliff, 99 s vs 19.5 s at ×1000);
    * with it the optimizer rotates the much-smaller relations below the
    * fact join and the plan converges to q06's hand-ordered shape.
    * Same oracle as q06 (identical row set by inner-join commutativity);
    * PlanSpec asserts the rotated plan. */
  private def q182(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .join(nat(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(reg(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  private val q06Sql =
    """SELECT r_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** q07: top-N per group via row_number window — the scalable "group top-k"
    * (one shuffle on the partition key, no driver collect). */
  private def q07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    cust(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"), col("rn"))
  }

  private val q07Sql =
    """SELECT c_nationkey, c_custkey, c_name, round(c_acctbal, 2) AS acctbal, rn
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      |      FROM customer)
      |WHERE rn <= 3""".stripMargin

  /** q08: running total window — sequential accumulation order is pinned by
    * the (date, key) total order, so doubles match the oracle exactly. */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord(s, d).select(col("o_custkey"), col("o_orderkey"),
      round(sum(col("o_totalprice")).over(w), 2).as("run_total"))
  }

  private val q08Sql =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
      |FROM orders""".stripMargin

  /** q09: lag/delta window (T5 rank-delta shape from SURVEY §2.6). */
  private def q09(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    ord(s, d).select(col("o_custkey"), col("o_orderkey"),
      round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2).as("delta"))
  }

  private val q09Sql =
    """SELECT o_custkey, o_orderkey,
      |  round(o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey), 2) AS delta
      |FROM orders""".stripMargin

  /** q10/q11: semi/anti existence joins (SURVEY §2.4 J4). */
  private def q10(s: SparkSession, d: String): DataFrame =
    cust(s, d).join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  private val q10Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  private def q11(s: SparkSession, d: String): DataFrame =
    cust(s, d).join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  private val q11Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** q12: distinct (D4/A6) — hash-shuffle dedup on the projected keys. */
  private def q12(s: SparkSession, d: String): DataFrame =
    cust(s, d).select(col("c_mktsegment"), col("c_nationkey")).distinct()

  private val q12Sql = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"

  /** q13–q15: set operations (SURVEY §2.7 D4). */
  private def q13(s: SparkSession, d: String): DataFrame =
    cust(s, d).select(col("c_nationkey").as("nationkey"))
      .union(sup(s, d).select(col("s_nationkey").as("nationkey")))
      .distinct()

  private val q13Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  private def q14(s: SparkSession, d: String): DataFrame =
    cust(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(sup(s, d).select(col("s_nationkey").as("nationkey")))

  private val q14Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  private def q15(s: SparkSession, d: String): DataFrame = {
    val big = cust(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey"))
    val supN = sup(s, d).select(col("s_nationkey").as("nationkey"))
    big.except(supN)
  }

  private val q15Sql =
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
      |EXCEPT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin

  /** q16: agg + HAVING (post-aggregation filter). */
  private def q16(s: SparkSession, d: String): DataFrame =
    ord(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .filter(col("n_orders") >= 15)

  private val q16Sql =
    """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 15""".stripMargin

  /** q17: conditional aggregation (CASE WHEN pivot shape) by order year. */
  private def q17(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
        round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))
          .otherwise(0.0)), 2).as("urgent_total"))

  private val q17Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
      |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END), 2) AS urgent_total
      |FROM orders GROUP BY 1""".stripMargin

  /** q18: rollup with subtotal rows (A7) — NULL group labels coalesced so the
    * oracle compare is unambiguous. */
  private def q18(s: SparkSession, d: String): DataFrame =
    li(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").cast("long").as("qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))

  private val q18Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** q19: scalar-subquery shape — global avg computed once and broadcast
    * (a 1-row cross join, not a driver collect). */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    val avgP = o.agg(avg(col("o_totalprice")).as("avg_price"))
    o.crossJoin(broadcast(avgP))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
  }

  private val q19Sql =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
      |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)""".stripMargin

  /** q20: scalar string-function surface (F1–F11). */
  private def q20(s: SparkSession, d: String): DataFrame =
    prt(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_up"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 4).as("type4"),
      concat(col("p_brand"), lit("/"), col("p_type"), lit("#"),
        col("p_size").cast("string")).as("tag"),
      trim(lower(col("p_brand"))).as("brand_lc"))

  private val q20Sql =
    """SELECT p_partkey, upper(p_name) AS name_up, length(p_name) AS name_len,
      |  substr(p_type, 1, 4) AS type4,
      |  p_brand || '/' || p_type || '#' || CAST(p_size AS VARCHAR) AS tag,
      |  trim(lower(p_brand)) AS brand_lc
      |FROM part""".stripMargin

  /** q21: regex predicate + substitution (F5/F6, P5). */
  private def q21(s: SparkSession, d: String): DataFrame =
    prt(s, d)
      .filter(col("p_type").rlike("^(STANDARD|SMALL)"))
      .select(col("p_partkey"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"),
        col("p_type"))

  private val q21Sql =
    """SELECT p_partkey, regexp_replace(p_name, ' ', '_', 'g') AS name_us, p_type
      |FROM part WHERE regexp_matches(p_type, '^(STANDARD|SMALL)')""".stripMargin

  /** q22: ordered string-concat aggregation (A2) — sort_array pins the
    * within-group order so it matches string_agg(... ORDER BY). */
  private def q22(s: SparkSession, d: String): DataFrame =
    sup(s, d).groupBy(col("s_nationkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("s_name")))).as("names"))

  private val q22Sql =
    """SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names
      |FROM supplier GROUP BY s_nationkey""".stripMargin

  /** q23: theta join (equi + range residual, SURVEY §2.4 J5). */
  private def q23(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d)
    val l = li(s, d)
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
  }

  private val q23Sql =
    """SELECT o_orderpriority, count(*) AS n_late
      |FROM orders JOIN lineitem
      |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority""".stripMargin

  /** q24: tumbling-window agg over the event stream table (ST2 batch view) —
    * date_trunc keeps the group key computable map-side. */
  private def q24(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(
        date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  private val q24Sql =
    """SELECT date_trunc('hour', ts) AS h, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q25: keep-first dedup over the stream table (ST4 batch equivalent of
    * watermark+dropDuplicates): earliest event per (user, type).
    * Round-9 shape: `min_by(value, (ts, event_id))` per (user, type) — a
    * MAP-SIDE-COMBINABLE aggregate (deterministic: the order key is
    * unique), where the row_number window formulation shuffled and
    * per-partition-sorted every full event row just to drop all but the
    * first (×100 yardstick: 4.2 s / 5.5 M records / 143 MB vs this
    * form's numbers in PERF.md r9). Same rows, same oracle. */
  private def q25(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min_by(col("value"),
        struct(col("ts"), col("event_id"))).as("first_value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("first_value")), 2).as("first_value_sum"))

  private val q25Sql =
    """SELECT event_type, count(*) AS n_users, round(sum(value), 2) AS first_value_sum
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      |      FROM events)
      |WHERE rn = 1 GROUP BY event_type""".stripMargin

  /** q26: date-part extraction + multi-key agg (F13–F15 surface). */
  private def q26(s: SparkSession, d: String): DataFrame =
    ord(s, d).groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))

  private val q26Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** q116: unpivot/melt — the wide→long reshape (inverse of q51's pivot):
    * each lineitem's four numeric measures become (metric, value) rows.
    * Spark plans this as a single narrow Expand (4 projections per input
    * row, map-side, no shuffle, no UDF) — at 100 TB melt is a free
    * pre-step for metric-keyed aggregation or storage. Oracle is the
    * portable UNION-ALL formulation. */
  private def q116(s: SparkSession, d: String): DataFrame =
    li(s, d).filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "metric", valueColumnName = "value")

  private val q116Sql =
    """WITH t AS (SELECT * FROM lineitem WHERE l_orderkey < 100)
      |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
      |       CAST(l_quantity AS DOUBLE) AS value FROM t
      |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
      |       CAST(l_extendedprice AS DOUBLE) FROM t
      |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
      |       CAST(l_discount AS DOUBLE) FROM t
      |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
      |       CAST(l_tax AS DOUBLE) FROM t""".stripMargin

  /** q117: TPC-H Q21 shape ("suppliers who kept orders waiting") — the
    * hardest textbook relational pattern: a semi-join AND an anti-join of
    * the same fact against itself (EXISTS another supplier on the order /
    * NOT EXISTS another LATE supplier). The oracle runs that literal
    * double-correlated-EXISTS form; the Spark side runs the SCALE
    * formulation — one aggregation over (order, supplier) facts computing
    * (suppliers, late-suppliers, the sole late supplier) per order, then a
    * filter `n_supp >= 2 AND n_late = 1` — which replaces two fact-fact
    * self-joins with one map-side-combinable shuffle on orderkey. The hash
    * match proves the rewrite. Late = shipped >45 days after order date,
    * 'F'-status orders only.
    *
    * The per-order distinct counts are computed as a two-level aggregate —
    * per-(order, supplier) max(late) first, then plain count/sum per order —
    * NOT as two `countDistinct`s: multiple distinct aggregates plan as an
    * Expand that triples every fact row before the exchange, which at 100 TB
    * is 3× the shuffle bytes for the same answer. The join runs FIRST so its
    * orderkey partitioning is reused by both aggregate levels
    * (HashPartitioning(orderkey) satisfies the (orderkey, suppkey)
    * clustering by the subset rule): at cluster scale the fact shuffles once
    * for the sort-merge join and never again; at bench scale the F-orders
    * side broadcasts and the per-pair partial agg combines map-side before
    * the single exchange. */
  private def q117(s: SparkSession, d: String): DataFrame = {
    val f = li(s, d)
      .join(ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"),
          1L).otherwise(0L).as("late"))
    val perSupp = f.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(col("late")).as("n_late"),
        min(when(col("late") === 1L, col("l_suppkey"))).as("blame"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    // group by s_NAME (after the broadcast name join), not by suppkey:
    // the SQL contract is GROUP BY s_name, and the two differ the moment
    // two suppkeys share a name — the x10 replica gate caught exactly
    // that (replicated suppliers keep their names under fresh keys; the
    // key-grouped form split each name's count ~10 ways and returned a
    // different top-10). One row per qualifying order reaches this agg
    // either way — same shuffle volume.
    perOrder.join(broadcast(sup(s, d)), col("blame") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  private val q117Sql =
    """WITH f AS (SELECT l.l_orderkey, l.l_suppkey,
      |    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      |        THEN 1 ELSE 0 END) AS late
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_orderstatus = 'F'
      |  GROUP BY 1, 2)
      |SELECT s_name, count(*) AS numwait
      |FROM f l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      |WHERE l1.late = 1
      |  AND EXISTS (SELECT 1 FROM f l2 WHERE l2.l_orderkey = l1.l_orderkey
      |              AND l2.l_suppkey != l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM f l3 WHERE l3.l_orderkey = l1.l_orderkey
      |                  AND l3.l_suppkey != l1.l_suppkey AND l3.late = 1)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  /** q120: ordered funnel conversion (view → click-after-view →
    * purchase-after-click) — the product-analytics staple where step N
    * only counts if it happens AFTER step N−1's first occurrence. Three
    * conditional-min aggregations, each map-side combinable and keyed on
    * user_id — the stages re-shuffle on the SAME key, so at scale AQE/
    * co-partitioning keeps them exchange-free after the first; no window,
    * no per-user collect. Single-row report. */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
    val s2 = e.join(s1, "user_id").groupBy(col("user_id"), col("t1"))
      .agg(min(when(col("event_type") === "click" && col("ts") >= col("t1"),
        col("ts"))).as("t2"))
    val s3 = e.join(s2, "user_id").groupBy(col("user_id"), col("t1"), col("t2"))
      .agg(min(when(col("event_type") === "purchase" && col("ts") >= col("t2"),
        col("ts"))).as("t3"))
    s3.agg(count(lit(1)).as("n_users"),
      count(col("t1")).as("n_view"),
      count(col("t2")).as("n_click_after"),
      count(col("t3")).as("n_purchase_after"))
  }

  private val q120Sql =
    """WITH s1 AS (SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      |  FROM events GROUP BY user_id),
      |s2 AS (SELECT e.user_id, s1.t1,
      |    min(CASE WHEN e.event_type = 'click' AND e.ts >= s1.t1
      |        THEN e.ts END) AS t2
      |  FROM events e JOIN s1 USING (user_id) GROUP BY 1, 2),
      |s3 AS (SELECT e.user_id, s2.t1, s2.t2,
      |    min(CASE WHEN e.event_type = 'purchase' AND e.ts >= s2.t2
      |        THEN e.ts END) AS t3
      |  FROM events e JOIN s2 USING (user_id) GROUP BY 1, 2, 3)
      |SELECT count(*) AS n_users, count(t1) AS n_view,
      |  count(t2) AS n_click_after, count(t3) AS n_purchase_after
      |FROM s3""".stripMargin

  /** q121: cohort retention — users bucketed by first-seen day; cell
    * (cohort, offset) counts distinct users from that cohort active
    * `offset` days later (the warehouse retention triangle). Two
    * map-side-combinable aggs + one key join; the matrix is bounded by
    * days², never user-count. Dates truncate identically cross-engine
    * (to_date == CAST(ts AS DATE)). */
  private def q121(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val firstSeen = e.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("cohort"))
    e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .join(firstSeen, "user_id")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  private val q121Sql =
    """WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort
      |           FROM events GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT cohort, datediff('day', cohort, day) AS offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin

  /** q122: peak concurrency — the sweep-line/interval-overlap aggregation:
    * user activity intervals (first→last event per user per day) become
    * +1/−1 boundary events; a running sum ordered by (ts, delta, user)
    * gives the number of simultaneously-active users at every instant; max
    * per day is the report. The window is PARTITIONED BY DAY — the sweep
    * sorts one day's boundaries at a time, never a global timeline (the
    * q53→q85 lesson); day-partition cardinality bounds the state.
    * Intervals are INCLUSIVE: starts (+1) sort before ends (−1) at the
    * same instant, so a user whose day has a single event still counts
    * and two users touching at an instant are both active there; user_id
    * is the final unique tiebreak. */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val spans = ev(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val bounds = spans.select(col("day"), col("user_id"), col("t0").as("ts"),
        lit(1).as("delta"))
      .unionByName(spans.select(col("day"), col("user_id"),
        col("t1").as("ts"), lit(-1).as("delta")))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("ts"), col("delta").desc, col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("load", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("load")).cast("long").as("peak"),
        count(lit(1)).cast("long").as("n_bounds"))
  }

  private val q122Sql =
    """WITH s AS (SELECT CAST(ts AS DATE) AS day, user_id,
      |    min(ts) AS t0, max(ts) AS t1 FROM events GROUP BY 1, 2),
      |b AS (SELECT day, user_id, t0 AS ts, 1 AS delta FROM s
      |      UNION ALL SELECT day, user_id, t1 AS ts, -1 AS delta FROM s),
      |r AS (SELECT day, sum(delta) OVER (PARTITION BY day
      |        ORDER BY ts, delta DESC, user_id ROWS UNBOUNDED PRECEDING) AS load
      |      FROM b)
      |SELECT day, CAST(max(load) AS BIGINT) AS peak,
      |  CAST(count(*) AS BIGINT) AS n_bounds
      |FROM r GROUP BY day""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql), bench = true),
    QueryDef("q02_selective_revenue", q02, Some(q02Sql), bench = true),
    QueryDef("q03_top_orders", q03, Some(q03Sql), bench = true),
    QueryDef("q04_exists_priority", q04, Some(q04Sql), bench = true),
    QueryDef("q05_nation_revenue", q05, Some(q05Sql), bench = true),
    QueryDef("q06_region_revenue", q06, Some(q06Sql)),
    QueryDef("q182_region_revenue_factfirst", q182, Some(q06Sql)),
    QueryDef("q07_topn_per_nation", q07, Some(q07Sql)),
    QueryDef("q116_unpivot", q116, Some(q116Sql)),
    QueryDef("q117_exclusive_blame", q117, Some(q117Sql), bench = true),
    QueryDef("q120_funnel", q120, Some(q120Sql)),
    QueryDef("q121_cohort_retention", q121, Some(q121Sql)),
    QueryDef("q122_peak_concurrency", q122, Some(q122Sql)),
    QueryDef("q08_running_total", q08, Some(q08Sql), bench = true),
    QueryDef("q09_order_delta", q09, Some(q09Sql)),
    QueryDef("q10_semi_join", q10, Some(q10Sql)),
    QueryDef("q11_anti_join", q11, Some(q11Sql)),
    QueryDef("q12_distinct", q12, Some(q12Sql)),
    QueryDef("q13_union", q13, Some(q13Sql)),
    QueryDef("q14_intersect", q14, Some(q14Sql)),
    QueryDef("q15_except", q15, Some(q15Sql)),
    QueryDef("q16_having", q16, Some(q16Sql)),
    QueryDef("q17_conditional_agg", q17, Some(q17Sql)),
    QueryDef("q18_rollup", q18, Some(q18Sql)),
    QueryDef("q19_above_avg", q19, Some(q19Sql)),
    QueryDef("q20_string_funcs", q20, Some(q20Sql)),
    QueryDef("q21_regex", q21, Some(q21Sql)),
    QueryDef("q22_ordered_concat", q22, Some(q22Sql)),
    QueryDef("q23_theta_join", q23, Some(q23Sql), bench = true),
    QueryDef("q24_events_hourly", q24, Some(q24Sql), bench = true),
    QueryDef("q25_events_dedup_first", q25, Some(q25Sql)),
    QueryDef("q26_orders_by_month", q26, Some(q26Sql)))
}
