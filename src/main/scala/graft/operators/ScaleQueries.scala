package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Third-wave operator coverage (round 2): as-of joins, window frames,
  * ntile bucketing, cube/grouping-sets, outer joins, grid densification,
  * per-row array functions, date arithmetic. Every query carries a DuckDB
  * oracle; determinism rules per QueryDef (Tables.scala).
  */
object ScaleQueries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  /** q52: as-of join (SURVEY §2.4 J5 family) — for each purchase event, the
    * most recent view by the same user at-or-before the purchase. Implemented
    * as the scalable single-pass form: union-free, one shuffle on user_id,
    * running max of view-ts over an ordered window (views sort before
    * purchases at equal ts to honor the ≤ bound). At 100 TB this beats the
    * range-join formulation because state per key is O(1), not O(events). */
  private def q52(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).filter(col("event_type").isin("view", "purchase"))
      .withColumn("is_p", when(col("event_type") === "purchase", 1).otherwise(0))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_p"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("view_ts", max(when(col("is_p") === 0, col("ts"))).over(w))
      .filter(col("is_p") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("view_ts"))
  }

  private val q52Sql =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  (SELECT max(v.ts) FROM events v
      |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |     AND v.ts <= p.ts) AS view_ts
      |FROM events p WHERE p.event_type = 'purchase'""".stripMargin

  /** q53: ntile decile bucketing of orders by total price — distribution
    * summary per decile. The global ntile is a single-partition sort by
    * construction (documented limit: at 100 TB decile boundaries come from
    * approx_percentile and a broadcast range join instead). */
  private def q53(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    ord(s, d).withColumn("decile", ntile(10).over(w))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
  }

  private val q53Sql =
    """SELECT decile, count(*) AS n, round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi
      |FROM (SELECT o_totalprice, o_orderkey,
      |        ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |      FROM orders)
      |GROUP BY decile""".stripMargin

  /** q85: the scale path for q53 — IDENTICAL output (same oracle), no
    * global sort of the fact table. ntile's global row position is
    * decomposed into
    *   pos = (# rows with a strictly smaller value) + (rank within the
    *          value's tie group, ordered by the unique key),
    * computed as (1) a per-value histogram — one map-side-combinable
    * shuffle on the value — (2) a running sum over the HISTOGRAM, whose
    * single-partition window is over the compressed value domain (bounded
    * by distinct prices: ~10⁶-10⁷ rows at 100 TB, versus ~10¹¹ fact rows
    * for q53's global sort), and (3) a row_number window partitioned by
    * value — distributed across the key space, co-partitioned with the
    * histogram join so the exchange is reused. The ntile bucket is then
    * pure integer arithmetic on pos (first N%k buckets get ⌈N/k⌉ rows):
    * exact, no rounding boundary. QueriesSpec asserts the only
    * single-partition window sits above an aggregate, not the scan. */
  private def q85(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d).select(col("o_orderkey"), col("o_totalprice"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val hist = o.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.select(col("cents"),
      coalesce(sum(col("cnt")).over(wCum), lit(0L)).as("cum_before"))
    val wTie = Window.partitionBy(col("cents")).orderBy(col("o_orderkey"))
    val nDf = o.agg(count(lit(1)).as("n_rows"))
    val pos = (col("cum_before") + col("rk")).as("pos")
    // doubles are exact for counts < 2^53, so floor(a / b) IS integer div
    val q = floor(col("n_rows") / 10).cast("long")  // base bucket size
    val r = col("n_rows") % 10                      // # buckets of size q+1
    val cut = r * (q + 1)                           // last pos in big buckets
    val decile = when(col("pos") <= cut,
        floor((col("pos") - 1) / (q + 1)).cast("long") + 1)
      .otherwise(r + floor((col("pos") - cut - 1) / q).cast("long") + 1)
    o.withColumn("rk", row_number().over(wTie))
      .join(cum, "cents")
      .crossJoin(broadcast(nDf))
      .select(col("o_totalprice"), pos, col("n_rows"))
      .withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
  }

  /** q54: bounded window frame — 4-order moving spend sum per customer
    * (ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), the classic incremental
    * frame the reference's dashboards imply. One shuffle on o_custkey.
    * A moving *sum* (not avg) keeps the oracle exact: avg of 4 two-decimal
    * prices lands on .xx5 boundaries where Spark's Double.toString-based
    * round (HALF_UP on shortest-decimal) and DuckDB's binary round split. */
  private def q54(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-3, Window.currentRow)
    ord(s, d).select(col("o_custkey"), col("o_orderkey"),
      round(sum(col("o_totalprice")).over(w), 2).as("msum"))
  }

  private val q54Sql =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS msum
      |FROM orders""".stripMargin

  /** q55: first_value/last_value over an unbounded frame — per-nation
    * poorest/richest customer names (unique (acctbal, custkey) order key). */
  private def q55(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cust(s, d).select(col("c_nationkey"),
        first(col("c_name")).over(w).as("poorest"),
        last(col("c_name")).over(w).as("richest"))
      .distinct()
  }

  private val q55Sql =
    """SELECT DISTINCT c_nationkey,
      |  first_value(c_name) OVER w AS poorest,
      |  last_value(c_name) OVER w AS richest
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** q56: cube (SURVEY §2.5 A7) over (returnflag, linestatus) with
    * grouping_id disambiguating subtotal levels. */
  private def q56(s: SparkSession, d: String): DataFrame =
    li(s, d).cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("qty"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("qty"))

  private val q56Sql =
    """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
      |  coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** q57: grouping sets (explicit subtotal lattice — the dbt marts-rollup
    * shape) via the SQL surface: (rf, ls), (rf), (). */
  private def q57(s: SparkSession, d: String): DataFrame = {
    li(s, d).createOrReplaceTempView("lineitem_gs")
    // revenue summed in INTEGER CENTS (prices are hundredth-exact), then
    // one exact-integer-to-double division: round(sum(double), 2) split a
    // last-cent boundary at the x10 grand total (6 M additions, sum
    // ~3.2e11 where double ULP is 6e-5 — the per-engine/per-order
    // accumulation drift exceeds the rounding step). The q50 medicine.
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(1) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0 AS rev
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |""".stripMargin)
  }

  private val q57Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n,
      |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS rev
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** q58: full outer join — high-balance customers against per-customer
    * order counts; both null sides survive (customers with no orders, and
    * order keys outside the filtered dim). */
  private def q58(s: SparkSession, d: String): DataFrame = {
    val c = cust(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_name"))
    val o = ord(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("ck"),
        col("c_name"), col("n_orders"))
  }

  private val q58Sql =
    """SELECT coalesce(c.c_custkey, o.o_custkey) AS ck, c.c_name, o.n_orders
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) c
      |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
      |                 FROM orders GROUP BY o_custkey) o
      |  ON c.c_custkey = o.o_custkey""".stripMargin

  /** q59: grid densification — nation × order-month cross join, left join
    * monthly revenue, zero-fill gaps. The cross join is broadcast (both
    * sides tiny after distinct), the fact-side aggregate is the only
    * shuffle — the standard calendar-densification shape for training-data
    * feature tables. */
  private def q59(s: SparkSession, d: String): DataFrame = {
    val months = ord(s, d)
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("month")).distinct()
    val nations = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"))
    val rev = ord(s, d)
      .join(cust(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(sum(col("o_totalprice")).as("rev"))
    nations.crossJoin(broadcast(months))
      .join(rev,
        col("n_nationkey") === col("c_nationkey") && months("month") === rev("month"),
        "left")
      .select(col("n_name"), nations("n_nationkey").as("nk"), months("month"),
        coalesce(round(col("rev"), 2), lit(0.0)).as("rev"))
  }

  private val q59Sql =
    """WITH months AS (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS month
      |                FROM orders),
      |rev AS (SELECT c_nationkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |          sum(o_totalprice) AS rev
      |        FROM orders JOIN customer ON o_custkey = c_custkey
      |        GROUP BY 1, 2)
      |SELECT n.n_name, n.n_nationkey AS nk, m.month,
      |  coalesce(round(r.rev, 2), 0.0) AS rev
      |FROM nation n CROSS JOIN months m
      |LEFT JOIN rev r ON n.n_nationkey = r.c_nationkey AND m.month = r.month""".stripMargin

  /** q60: per-row array functions (F17–F19 widened) over tokenized text —
    * token counts, distinct counts, boundary tokens, membership test. All
    * codegen'd built-ins, no UDF. */
  private def q60(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, d).select(col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      element_at(toks, 1).as("first_tok"),
      element_at(toks, -1).as("last_tok"),
      array_contains(toks, "data").cast("int").as("has_data"))
  }

  private val q60Sql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |  string_split(text, ' ')[1] AS first_tok,
      |  string_split(text, ' ')[-1] AS last_tok,
      |  CAST(list_contains(string_split(text, ' '), 'data') AS INTEGER) AS has_data
      |FROM documents""".stripMargin

  /** q61: date arithmetic (F13–F16) — month truncation, ISO weekday,
    * interval add; grouped counts. */
  private def q61(s: SparkSession, d: String): DataFrame =
    ord(s, d)
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        (weekday(col("o_orderdate")) + 1).as("isodow"))
      .groupBy(col("month"), col("isodow"))
      .agg(count(lit(1)).as("n"))
      .withColumn("next_month", add_months(col("month"), 1))

  private val q61Sql =
    """SELECT month, isodow, count(*) AS n,
      |  CAST(month + INTERVAL 1 MONTH AS DATE) AS next_month
      |FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |        CAST(isodow(o_orderdate) AS INTEGER) AS isodow
      |      FROM orders)
      |GROUP BY 1, 2""".stripMargin

  /** q63: salted shuffle join (skew mitigation) — result must be identical
    * to the plain equi-join, so the oracle is the unsalted SQL. Aggregated
    * output keeps the check small while covering the join body.
    *
    * Fixture (re-cut in r12 to exercise salting's actual regime): the left
    * key routes every first-line row to suppkey 1 — ≈25% of lineitem lands
    * on ONE key, the textbook hot reducer — against the supplier table,
    * which at yardstick scales is exactly salting's "small but not
    * broadcast-small" right side (×1000: 1M rows ≫ the 10 MB broadcast
    * threshold, but the 8× replication is only 8M rows — replicating a
    * FACT-sized right side to spread one hot key is hotKeySplitJoin's
    * regime, not this one). At sf≤0.01 supplier is broadcast-sized and
    * saltedInnerJoin's guard no-ops to the plain join (result-identical by
    * construction; the guard is spec-covered); at scale the salt spreads
    * the 150M-row hot key across 8 reducers instead of one straggler. The
    * sum is integer-valued (quantity), so the oracle compare is exact
    * regardless of the salt's row routing. */
  private def q63(s: SparkSession, d: String): DataFrame = {
    val hotFact = li(s, d).select(
      when(col("l_linenumber") === 1, lit(1L))
        .otherwise(col("l_suppkey")).as("s_suppkey"),
      col("l_quantity"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    SkewJoin.saltedInnerJoin(hotFact, supp, Seq("s_suppkey"), saltFactor = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("qty"))
  }

  private val q63Sql =
    """SELECT s_name, count(*) AS n,
      |  CAST(sum(l_quantity) AS BIGINT) AS qty
      |FROM lineitem JOIN supplier
      |  ON (CASE WHEN l_linenumber = 1 THEN 1 ELSE l_suppkey END) = s_suppkey
      |GROUP BY s_name""".stripMargin

  /** q64: hot-key-split join (broadcast path for hot keys, shuffle path for
    * the cold tail) — same oracle-identity property as q63. Hot keys here
    * are the busiest order keys by line count. */
  private def q64(s: SparkSession, d: String): DataFrame = {
    val o = ord(s, d).select(col("o_orderkey").as("l_orderkey"),
      col("o_orderpriority"))
    SkewJoin.hotKeySplitJoin(li(s, d), o, "l_orderkey",
        hotKeys = Seq(1L, 7L, 42L, 4242L))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("rev"))
  }

  private val q64Sql =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(l_extendedprice), 2) AS rev
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Typed row for q68 (SURVEY §1.4: `Dataset[T]` where type safety helps). */
  final case class LineRevenue(l_returnflag: String, l_extendedprice: Double,
      l_discount: Double)

  /** Typed revenue sum as an `Aggregator` — unlike `mapGroups`, an
    * Aggregator keeps map-side partial aggregation (reduce/merge), so the
    * typed path costs the same shuffle as the untyped one. */
  private object RevenueAgg
      extends org.apache.spark.sql.expressions.Aggregator[LineRevenue, Double, Double] {
    def zero: Double = 0.0
    def reduce(acc: Double, r: LineRevenue): Double =
      acc + r.l_extendedprice * (1.0 - r.l_discount)
    def merge(a: Double, b: Double): Double = a + b
    def finish(acc: Double): Double = acc
    def bufferEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** q68: the typed Dataset API surface — case-class rows, typed filter,
    * groupByKey + typed Aggregator — oracle-checked like any untyped query.
    * Revenue is rounded to whole units: the typed fold's accumulation order
    * differs from SQL sum's, so cents-level doubles can split. */
  private def q68(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    li(s, d).select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"))
      .as[LineRevenue]
      .filter((r: LineRevenue) => r.l_discount > 0.02)
      .groupByKey(_.l_returnflag)
      .agg(RevenueAgg.toColumn.name("revenue"))
      .select(col("key").as("l_returnflag"),
        round(col("revenue"), 0).cast("long").as("rev_units"))
  }

  private val q68Sql =
    """SELECT l_returnflag,
      |  CAST(round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS BIGINT)
      |    AS rev_units
      |FROM lineitem WHERE l_discount > 0.02
      |GROUP BY l_returnflag""".stripMargin

  /** q77: TPC-H Q22 shape — high-balance customers (above the positive-
    * balance average, a scalar subquery) with no high-value orders (anti
    * join; every customer in this corpus has SOME order, so the classic
    * no-orders predicate would be vacuous). Cross-join broadcast of the
    * one-row average; anti join against the filtered orders key set. */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val c = cust(s, d)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("ab"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(ord(s, d).filter(col("o_totalprice") > 450000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(substring(col("c_name"), -1, 1).as("suffix"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  private val q77Sql =
    """SELECT suffix, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
      |FROM (SELECT c_custkey, c_acctbal,
      |        substr(c_name, length(c_name), 1) AS suffix
      |      FROM customer
      |      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                         WHERE c_acctbal > 0)
      |        AND c_custkey NOT IN (SELECT o_custkey FROM orders
      |                              WHERE o_totalprice > 450000))
      |GROUP BY suffix""".stripMargin

  /** q78: TPC-H Q16 shape — supplier-count per part attribute group with a
    * NOT-LIKE exclusion; distinct-count after a join (two shuffles, both
    * partial-aggregated). */
  private def q78(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(!col("p_type").like("%_2%"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .filter(col("supplier_cnt") >= 5)

  private val q78Sql =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type NOT LIKE '%_2%'
      |GROUP BY p_brand, p_size
      |HAVING count(DISTINCT l_suppkey) >= 5""".stripMargin

  /** q79: approx_percentile (t-digest-family sketch) under the q44-style
    * accuracy contract: the sketch value is engine-specific, but "within 1%
    * of the exact interpolated quantile" is deterministic for fixed data. */
  private def q79(s: SparkSession, d: String): DataFrame =
    ord(s, d).agg(
        percentile(col("o_totalprice"), lit(0.5)).as("exact_med"),
        approx_percentile(col("o_totalprice"), lit(0.5), lit(10000)).as("approx_med"))
      .select(
        round(col("exact_med") * 200, 0).cast("long").as("exact_med_x200"),
        (abs(col("approx_med") - col("exact_med")) /
          col("exact_med") <= 0.01).cast("int").as("approx_within_1pct"))

  private val q79Sql =
    """SELECT CAST(round(quantile_cont(o_totalprice, 0.5) * 200, 0) AS BIGINT)
      |    AS exact_med_x200,
      |  1 AS approx_within_1pct
      |FROM orders""".stripMargin

  /** q80: rank-family windows — percent_rank and cume_dist are exact
    * rational formulas over a unique total order, so the doubles match
    * across engines without tolerance. */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    li(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
  }

  private val q80Sql =
    """SELECT l_returnflag, l_orderkey, l_linenumber,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd
      |FROM lineitem WHERE l_orderkey < 100
      |WINDOW w AS (PARTITION BY l_returnflag
      |             ORDER BY l_orderkey, l_linenumber)""".stripMargin

  /** q81: the custom DataSourceV2 connector under the oracle gate — reads
    * the graft-synth generator (8 ranged partitions, pruned columns) and
    * aggregates; DuckDB reproduces the table from range(0, 5000) with the
    * same overflow-free arithmetic. val_sum is safe at 1 decimal: the true
    * sum has exactly one decimal digit, so no rounding boundary exists. */
  private def q81(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.v2.SyntheticEventsProvider")
      .option("rows", "5000").option("partitions", "8").load()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("user_id")).cast("long").as("sum_user"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        round(sum(col("value")), 1).as("val_sum"))

  private val q81Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS sum_user,
      |  min(id) AS min_id, max(id) AS max_id,
      |  round(sum(value), 1) AS val_sum
      |FROM (SELECT range AS id, range % 150 AS user_id,
      |        ['view', 'click', 'purchase', 'signup', 'error']
      |          [CAST((range * 7) % 5 AS INTEGER) + 1] AS event_type,
      |        CAST(((range % 9973) * 31 + 7) % 1000 AS DOUBLE) / 10.0 AS value
      |      FROM range(0, 5000))
      |GROUP BY event_type""".stripMargin

  /** q102: the DSv2 connector with an id-range predicate PUSHED INTO THE
    * SOURCE (SupportsPushDownFilters): partition planning narrows to
    * [1000, 4000) before any row is generated — the connector-level
    * analogue of partition pruning, plan-asserted in Dsv2Spec. The oracle
    * states the same range directly. */
  private def q102(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.v2.SyntheticEventsProvider")
      .option("rows", "5000").option("partitions", "8").load()
      .filter(col("id") >= 1000 && col("id") < 4000)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("user_id")).cast("long").as("sum_user"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        round(sum(col("value")), 1).as("val_sum"))

  private val q102Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS sum_user,
      |  min(id) AS min_id, max(id) AS max_id,
      |  round(sum(value), 1) AS val_sum
      |FROM (SELECT range AS id, range % 150 AS user_id,
      |        ['view', 'click', 'purchase', 'signup', 'error']
      |          [CAST((range * 7) % 5 AS INTEGER) + 1] AS event_type,
      |        CAST(((range % 9973) * 31 + 7) % 1000 AS DOUBLE) / 10.0 AS value
      |      FROM range(1000, 4000))
      |GROUP BY event_type""".stripMargin

  /** q82: math scalar surface (SURVEY §2.8) in exact space — floor/ceil/
    * abs/sign/mod/greatest/least over prices and keys produce integers, so
    * the comparison needs no rounding tolerance at all. */
  private def q82(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .filter(col("l_orderkey") < 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_quantity") - lit(25.0)).cast("long").as("qty_dev"),
        signum(col("l_quantity") - lit(25.0)).cast("int").as("qty_sign"),
        (col("l_partkey") % 97).as("pk_mod"),
        greatest(col("l_quantity"), col("l_linenumber").cast("double"))
          .cast("long").as("g"),
        least(col("l_quantity"), col("l_linenumber").cast("double"))
          .cast("long").as("l"))

  private val q82Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  CAST(abs(l_quantity - 25.0) AS BIGINT) AS qty_dev,
      |  CAST(sign(l_quantity - 25.0) AS INTEGER) AS qty_sign,
      |  l_partkey % 97 AS pk_mod,
      |  CAST(greatest(l_quantity, CAST(l_linenumber AS DOUBLE)) AS BIGINT) AS g,
      |  CAST(least(l_quantity, CAST(l_linenumber AS DOUBLE)) AS BIGINT) AS l
      |FROM lineitem WHERE l_orderkey < 200""".stripMargin

  /** q83: banded range join — every view within the half hour before any
    * purchase (cross-user, so no equi key exists and Catalyst would plan a
    * nested-loop join; the band rewrite shuffles on the time bucket
    * instead). Result must equal the naive range predicate, which is what
    * the oracle states directly. */
  private def q83(s: SparkSession, d: String): DataFrame = {
    val p = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withColumn("lo", col("p_ts") - expr("INTERVAL 30 MINUTE"))
    val v = ev(s, d).filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("v_ts"))
    RangeJoin.bandedIntervalJoin(v, "v_ts", p, "lo", "p_ts",
        bandUs = 30L * 60 * 1000000)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_views"),
        min(col("view_id")).as("first_view"))
  }

  private val q83Sql =
    """SELECT p.event_id AS purchase_id, count(*) AS n_views,
      |  min(v.event_id) AS first_view
      |FROM events p JOIN events v
      |  ON v.event_type = 'view' AND p.event_type = 'purchase'
      | AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
      |GROUP BY 1""".stripMargin

  /** q100: the SAME query as q83 written as the naive theta join — no
    * explicit banding anywhere in the user code. The injected
    * [[graft.plans.BandedIntervalJoinRule]] rewrites the interval-only join
    * into the banded equi form at optimization time (plan-asserted in
    * RangeJoinSpec), so the natural formulation gets the scale-safe plan.
    * Same oracle as q83: all three formulations (naive SQL in DuckDB,
    * explicit banding, auto-rewrite) must hash-match. */
  private def q100(s: SparkSession, d: String): DataFrame = {
    val p = ev(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withColumn("lo", col("p_ts") - expr("INTERVAL 30 MINUTE"))
    val v = ev(s, d).filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("v_ts"))
    v.join(p, col("v_ts") >= col("lo") && col("v_ts") <= col("p_ts"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_views"),
        min(col("view_id")).as("first_view"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q52_asof_join", q52, Some(q52Sql), bench = true),
    QueryDef("q53_deciles", q53, Some(q53Sql)),
    QueryDef("q85_deciles_scalable", q85, Some(q53Sql)),
    QueryDef("q54_moving_avg", q54, Some(q54Sql), bench = true),
    QueryDef("q55_value_windows", q55, Some(q55Sql)),
    QueryDef("q56_cube", q56, Some(q56Sql)),
    QueryDef("q57_grouping_sets", q57, Some(q57Sql)),
    QueryDef("q58_full_outer", q58, Some(q58Sql)),
    QueryDef("q59_dense_grid", q59, Some(q59Sql)),
    QueryDef("q60_array_funcs", q60, Some(q60Sql)),
    QueryDef("q61_date_arith", q61, Some(q61Sql)),
    QueryDef("q63_salted_join", q63, Some(q63Sql)),
    QueryDef("q64_hotkey_join", q64, Some(q64Sql)),
    QueryDef("q68_typed_agg", q68, Some(q68Sql)),
    QueryDef("q77_no_order_custs", q77, Some(q77Sql)),
    QueryDef("q78_supplier_cnt", q78, Some(q78Sql)),
    QueryDef("q79_approx_quantile", q79, Some(q79Sql)),
    QueryDef("q80_rank_family", q80, Some(q80Sql)),
    QueryDef("q81_dsv2_source", q81, Some(q81Sql)),
    QueryDef("q82_math_funcs", q82, Some(q82Sql)),
    QueryDef("q83_range_join", q83, Some(q83Sql)),
    QueryDef("q100_auto_range_join", q100, Some(q83Sql)),
    QueryDef("q102_dsv2_pushdown", q102, Some(q102Sql)))
}
