package graft

import graft.functions.OrderedConcat
import graft.operators.MlbAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Team season report / game stats / rates over synthetic game rows, plus
  * the ordered-concat Aggregator's parallelism-independence. */
class MlbAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def gamelogs = {
    import spark.implicits._
    // (v_team, h_team, v_score, h_score, attendance, park_id, day_night, duration)
    Seq(
      ("AAA", "BBB", 7, 4, 30000, "PK1", "N", 180),
      ("BBB", "AAA", 2, 3, 41000, "PK2", "D", 160),
      ("CCC", "AAA", 5, 1, 39000, "PK2", "N", 175),
      ("AAA", "CCC", 2, 2, 15000, "PK3", "D", 150)) // tie: counts as loss for both
      .toDF("v_team", "h_team", "v_score", "h_score", "attendance",
        "park_id", "day_night", "duration_min")
  }

  private def teams = {
    import spark.implicits._
    Seq(("AAA", "N", "Springfield", "Isotopes"),
      ("BBB", "A", "Shelbyville", "Sharks"),
      ("CCC", "N", "Ogdenville", "Owls"))
      .toDF("abbr", "league", "city", "nickname")
  }

  test("team season report: wins/losses/run-diff/rank") {
    val report = MlbAnalytics.teamSeasonReport(gamelogs, teams)
    val aaa = report.filter(col("team") === "AAA").head()
    // AAA: W vs BBB (7-4), W home vs BBB (3-2), L home vs CCC (1-5), T@CCC (2-2 → loss)
    assert(aaa.getAs[Long]("wins") == 2 && aaa.getAs[Long]("losses") == 2)
    assert(aaa.getAs[Long]("run_diff") == (7 + 3 + 1 + 2) - (4 + 2 + 5 + 2))
    assert(aaa.getAs[String]("nickname") == "Isotopes")
    // rank 1 is the best win_pct
    val top = report.filter(col("rank") === 1).head()
    assert(top.getAs[String]("team") == "AAA")
  }

  test("game statistics mart aggregates per park/day-night") {
    val gs = MlbAnalytics.gameStatistics(gamelogs)
    val pk2n = gs.filter(col("park_id") === "PK2" && col("day_night") === "N").head()
    assert(pk2n.getAs[Long]("games") == 1)
    assert(pk2n.getAs[Double]("avg_total_runs") == 6.0)
  }

  test("power rankings delta") {
    val cur = MlbAnalytics.teamSeasonReport(gamelogs, teams)
    val prev = cur.withColumn("rank", lit(99) - col("rank")) // fake prior ranks
    val delta = MlbAnalytics.powerRankingsDelta(cur, prev)
    assert(delta.count() == 3)
    assert(delta.columns.contains("delta"))
  }

  test("ordered concat Aggregator is deterministic under repartition") {
    import spark.implicits._
    val data = (1 to 50).map(i => (f"k$i%03d", s"v$i"))
    val agg = OrderedConcat(",").toColumn.name("joined")
    val a = spark.createDataset(data).repartition(8).select(agg).head()
    val b = spark.createDataset(data).repartition(1).select(agg).head()
    assert(a == b)
    assert(a.startsWith("v1,v2,v3") || a.startsWith("v1,"))
  }
}
