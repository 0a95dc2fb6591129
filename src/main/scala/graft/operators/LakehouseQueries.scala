package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse-scale operator queries: broadcast-Bloom semi-join pushdown
  * ([[BloomJoin]]), SCD Type-2 dimension versioning and Z-order layout
  * ([[Lakehouse]]) — the table-maintenance / join-pruning surface a 100 TB
  * warehouse runs around the analytical queries.
  */
object LakehouseQueries {

  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  /** q104: Bloom-prefiltered fact join — urgent-order revenue by return flag,
    * with lineitem pruned through a broadcast Bloom filter of the filtered
    * order keys BEFORE the join shuffle. The oracle is the PLAIN join SQL:
    * Bloom false positives die in the exact join, false negatives are
    * impossible, so the operator must be bit-identical to the naive plan —
    * the same equivalence-under-oracle pattern as the salted/hot-key joins
    * (q63/q64). At 100 TB the filter (≈12 MB for 10M keys at 1% fpp)
    * replaces a full fact-table shuffle with a scan-side prune. The filter
    * is sized from the dim's own count (BloomJoin's default) — r11's
    * hardcoded 65k-item filter saturated against the 300k–30M urgent keys
    * at yardstick scales and pruned nothing (630M-record shuffle at
    * ×1000); auto-sizing is what makes the operator do its job. */
  private def q104(s: SparkSession, d: String): DataFrame = {
    val dim = ord(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    BloomJoin.prefilteredJoin(li(s, d), dim, "l_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
  }

  private val q104Sql =
    """SELECT l_returnflag, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag""".stripMargin

  /** q107: SCD Type-2 dimension versioning — orders replayed as a per-
    * customer change log: each change carries its validity interval
    * ([valid_from, valid_to), NULL = current). The window is PARTITIONED by
    * the dimension key — parallel across customers, no global sort; the
    * output is the standard CDC-merge target an as-of lookup (q52) or
    * banded range join (q83) consumes. */
  private def q107(s: SparkSession, d: String): DataFrame =
    Lakehouse.scd2(ord(s, d), key = "o_custkey", orderCol = "o_orderdate",
        tiebreak = "o_orderkey")
      .select(col("o_custkey"), col("version"), col("o_orderkey"),
        col("o_totalprice"), col("valid_from"), col("valid_to"),
        col("is_current"))

  private val q107Sql =
    """SELECT o_custkey, row_number() OVER w AS version, o_orderkey,
      |  o_totalprice, o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER w AS valid_to,
      |  lead(o_orderdate) OVER w IS NULL AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** q108: Z-order clustering key — the Morton interleave of
    * (o_custkey mod 1024, order-date epoch-day mod 1024) that
    * `Lakehouse.zOrderBy` lays files out by, pinned bit-for-bit under the
    * oracle (the DuckDB side reconstructs the interleave arithmetically).
    * Sorting by z co-clusters rows close in BOTH dimensions, so row-group
    * min/max stats prune predicates on either column — the multi-column
    * generalization of the single-column layout q71's partitioned sink
    * gives. First 20 rows by (z, key) pin the math; ties in z are real
    * (same customer bucket + day) and broken by the unique key. */
  private def q108(s: SparkSession, d: String): DataFrame = {
    val x = col("o_custkey") % 1024
    val y = datediff(col("o_orderdate"), to_date(lit("1970-01-01"))) % 1024
    ord(s, d)
      .select(col("o_orderkey"),
        x.cast("long").as("x"), y.cast("long").as("y"),
        Lakehouse.zValue(x, y, bits = 10).cast("long").as("z"))
      .orderBy(col("z"), col("o_orderkey"))
      .limit(20)
  }

  private val q108Sql: String = {
    val terms = (0 until 10).flatMap { i =>
      Seq(s"((x // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")
    s"""WITH d AS (SELECT o_orderkey,
      |    o_custkey % 1024 AS x,
      |    datediff('day', DATE '1970-01-01', o_orderdate) % 1024 AS y
      |  FROM orders)
      |SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
      |  CAST($terms AS BIGINT) AS z
      |FROM d ORDER BY z, o_orderkey LIMIT 20""".stripMargin
  }

  /** q111: streaming CDC → SCD2 — the change log arrives as a 3-file stream
    * (slices by o_orderkey mod 3, one file per micro-batch via
    * maxFilesPerTrigger=1) and `foreachBatch` folds each batch into a
    * key-bucketed parquet dimension with [[Lakehouse.scd2MergeIntoBuckets]]:
    * only the buckets a batch touches are read (partition-pruned) and
    * rewritten (dynamic partition overwrite). The drained dimension must
    * equal the one-shot batch recompute — q107's oracle SQL verbatim, the
    * stream==batch equivalence pattern of q67/q76/q88/q98. Arrival order
    * can't matter: the merge replays full per-key chains. */
  private def q111(s: SparkSession, d: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val ordDf = ord(s, d)
    // the dim parquet must outlive this method (the returned frame reads it
    // lazily), so it can only be reclaimed at JVM exit — without this,
    // repeated verify/bench runs accumulate a dim tree per run in /tmp
    val base = graft.TempDirs.scratchAtExit("scd2_cdc")
    val srcDir = base.resolve("in")
    java.nio.file.Files.createDirectories(srcDir)
    val dimPath = base.resolve("dim").toString
    def rmTree(p: java.nio.file.Path): Unit = graft.TempDirs.rmTree(p)
    (0 to 2).foreach { i =>
      val staging = base.resolve(s"stage$i")
      ordDf.filter(pmod(col("o_orderkey"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val listing = java.nio.file.Files.list(staging)
      try {
        val part = listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        java.nio.file.Files.copy(part, srcDir.resolve(s"slice$i.parquet"))
      } finally listing.close()
      rmTree(staging)
    }
    val stream = s.readStream.schema(ordDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    val q = stream.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        Lakehouse.scd2MergeIntoBuckets(batch, dimPath, key = "o_custkey",
          orderCol = "o_orderdate", tiebreak = "o_orderkey"))
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    // drop everything the result no longer needs (the dim parquet stays —
    // the returned frame reads it lazily); a repeated verify/bench run
    // would otherwise accumulate staged slices + checkpoint state in /tmp
    rmTree(srcDir)
    rmTree(base.resolve("ckpt"))
    s.read.parquet(dimPath)
      .select(col("o_custkey"), col("version"), col("o_orderkey"),
        col("o_totalprice"), col("valid_from"), col("valid_to"),
        col("is_current"))
  }

  /** q125: table profile — the per-column stats pass (rows, nulls, exact
    * distinct, min/max) that feeds layout and optimizer decisions: which
    * column to Z-order or bloom-index (high-distinct → q108/bloomIndexedWrite),
    * whether a dim is broadcastable, where min/max row-group stats will
    * actually prune. One aggregate per profiled column unioned into a tidy
    * (column, n, n_null, n_distinct, min_v, max_v) report; at 100 TB swap
    * the exact countDistinct for approx_count_distinct (q44's contract
    * bounds the error) and run on a partition sample — the report shape is
    * unchanged. */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val t = li(s, d)
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map { c =>
        t.agg(count(lit(1)).as("n"),
          (count(lit(1)) - count(col(c))).cast("long").as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          round(min(col(c)), 4).as("min_v"),
          round(max(col(c)), 4).as("max_v"))
          .select(lit(c).as("column"), col("n"), col("n_null"),
            col("n_distinct"), col("min_v"), col("max_v"))
      }
      .reduce(_.unionByName(_))
  }

  private val q125Sql: String = {
    val selects = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n,
          |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
          |  count(DISTINCT $c) AS n_distinct,
          |  round(min($c), 4) AS min_v, round(max($c), 4) AS max_v
          |FROM lineitem""".stripMargin
      }
    selects.mkString("\n|UNION ALL\n|".stripMargin)
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q104_bloom_join", q104, Some(q104Sql), bench = true),
    QueryDef("q107_scd2", q107, Some(q107Sql)),
    QueryDef("q108_zorder", q108, Some(q108Sql)),
    QueryDef("q111_stream_scd2", q111, Some(q107Sql)),
    QueryDef("q125_table_profile", q125, Some(q125Sql)))
}
