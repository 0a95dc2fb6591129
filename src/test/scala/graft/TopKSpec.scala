package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the map-side-pruned group top-k (q114's operator);
  * exact output equality with the window form is the DuckDB oracle gate. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("perGroupPruned equals the window form across k and partitionings") {
    val cust = Tables.customer(spark, TestSpark.sf0001)
      .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    Seq(1, 3, 10).foreach { k =>
      Seq(cust, cust.repartition(7), cust.repartition(1)).foreach { df =>
        val pruned = TopK.perGroupPruned(df, Seq("c_nationkey"),
          "c_acctbal", "c_custkey", k).collect().map(_.toSeq).toSet
        val plain = windowForm(df, k).collect().map(_.toSeq).toSet
        assert(pruned == plain, s"mismatch at k=$k")
      }
    }
  }

  test("partialPrune keeps supersets of the answer and strictly prunes") {
    // sf0.01: 1500 customers / 25 nations / 4 partitions — ~15 rows per
    // (partition, group), so the k=3 heaps must prune most of them
    val cust = Tables.customer(spark, TestSpark.sf001)
      .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
      .repartition(4)
    val k = 3
    val survivors = TopK.partialPrune(cust, Seq("c_nationkey"),
      "c_acctbal", "c_custkey", k)
    val nSurv = survivors.count()
    assert(nSurv < cust.count() / 2, s"prune too weak: $nSurv survivors")
    // bound: ≤ partitions·k per group
    val perGroup = survivors.groupBy("c_nationkey").count().collect()
    perGroup.foreach(r => assert(r.getLong(1) <= 4L * k))
    // the true top-k rows all survive
    val answer = windowForm(cust, k).drop("rn").collect().map(_.toSeq).toSet
    val kept = survivors.collect().map(_.toSeq).toSet
    assert(answer.subsetOf(kept))
  }

  test("the prune shrinks the exchange: fewer shuffle records than the window form") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // walk through AQE wrappers and materialized query stages
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case _ => p.children.flatMap(nodes)
    }) :+ p
    def shuffleRecords(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      nodes(df.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeLike =>
          s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
      }.sum
    }
    val cust = Tables.customer(spark, TestSpark.sf001)
      .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
      .repartition(4) // fix the input partitioning so both forms start equal
    val plain = shuffleRecords(windowForm(cust, 3))
    val pruned = shuffleRecords(TopK.perGroupPruned(
      cust, Seq("c_nationkey"), "c_acctbal", "c_custkey", 3))
    // plain shuffles all 1500 customers + the repartition; pruned shuffles
    // the repartition + ≤ 4·3·25 survivors
    assert(pruned < plain,
      s"prune did not shrink the exchange: $pruned vs $plain records")
    assert(pruned - 1500 <= 4L * 3 * 25,
      s"survivor exchange too large: ${pruned - 1500}")
  }

  test("groups smaller than k keep all rows; null order values rank worst") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1L, Some(5.0)), ("g1", 2L, Some(7.0)),
      ("g2", 3L, None), ("g2", 4L, Some(1.0)), ("g2", 5L, Some(2.0)),
      ("g3", 6L, Some(9.9))
    ).toDF("g", "id", "v")
      .select(col("g"), col("id"), col("v").cast("double").as("v"))
    val got = TopK.perGroupPruned(df, Seq("g"), "v", "id", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    // g1: both rows (7.0 first); g2: 2.0 then 1.0 (null evicted); g3: single
    assert(got == Set(("g1", 2L, 1), ("g1", 1L, 2),
      ("g2", 5L, 1), ("g2", 4L, 2), ("g3", 6L, 1)))
  }
}
