package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLB analytics marts over the Retrosheet/teams/player-stats tables — the
  * concrete "Team Performance" / "Game Statistics" dashboards the reference
  * declares but leaves empty (dbt marts at dbt/dbt_project.yml:20-24;
  * READMEs under visualization/dashboards/). SURVEY.md §7.2's minimum
  * end-to-end slice.
  */
object MlbAnalytics {

  /** Per-team season report: union of home/visitor perspectives →
    * wins/losses/runs/run-diff/attendance → broadcast-join the 32-row teams
    * dim → win% rank. One shuffle on team; dim join never shuffles. */
  def teamSeasonReport(gamelogs: DataFrame, teams: DataFrame): DataFrame = {
    val home = gamelogs.select(
      col("h_team").as("team"),
      (col("h_score") > col("v_score")).cast("int").as("win"),
      col("h_score").as("runs_for"), col("v_score").as("runs_against"),
      col("attendance"))
    val visitor = gamelogs.select(
      col("v_team").as("team"),
      (col("v_score") > col("h_score")).cast("int").as("win"),
      col("v_score").as("runs_for"), col("h_score").as("runs_against"),
      lit(null).cast("int").as("attendance")) // attendance belongs to home side
    val perTeam = home.unionByName(visitor)
      .groupBy(col("team"))
      .agg(
        sum(col("win")).as("wins"),
        (count(lit(1)) - sum(col("win"))).as("losses"),
        sum(col("runs_for")).as("runs_for"),
        sum(col("runs_against")).as("runs_against"),
        (sum(col("runs_for")) - sum(col("runs_against"))).as("run_diff"),
        round(avg(col("attendance")), 1).as("avg_home_attendance"))
      .withColumn("win_pct",
        round(col("wins").cast("double") / (col("wins") + col("losses")), 4))
    perTeam
      .join(broadcast(teams), perTeam("team") === teams("abbr"), "left")
      .withColumn("rank", rank().over(
        Window.orderBy(col("win_pct").desc, col("team"))))
      .select("rank", "team", "city", "nickname", "wins", "losses", "win_pct",
        "runs_for", "runs_against", "run_diff", "avg_home_attendance")
  }

  /** Power-rankings with previous-rank delta (T5: the reference's
    * rankings-with-movement article shape, scripts/test_openai.py:10). */
  def powerRankingsDelta(report: DataFrame, prevReport: DataFrame): DataFrame = {
    val prev = prevReport.select(col("team"), col("rank").as("prev_rank"))
    report.join(broadcast(prev), Seq("team"), "left")
      .withColumn("delta", col("prev_rank") - col("rank"))
      .select("rank", "team", "prev_rank", "delta", "win_pct")
  }

  /** Game-statistics mart: per (park, day/night) attendance + scoring.
    * Exact integer totals carry the oracle gate (q87); the avg columns are
    * UI conveniences whose round() sits on .xx5 boundaries for two parks in
    * the 2024 logs (7.8125 runs, 25283.75 attendance) — exactly the
    * binary-vs-shortest-decimal rounding split QueryDef documents, so they
    * are spec-tested rather than hash-compared. */
  def gameStatistics(gamelogs: DataFrame): DataFrame =
    gamelogs.groupBy(col("park_id"), col("day_night"))
      .agg(
        count(lit(1)).as("games"),
        sum(col("attendance")).cast("long").as("total_attendance"),
        sum(col("v_score") + col("h_score")).cast("long").as("total_runs"),
        max(col("duration_min")).as("longest_game_min"),
        round(avg(col("attendance")), 1).as("avg_attendance"),
        round(avg(col("v_score") + col("h_score")), 3).as("avg_total_runs"))

  /** Rate-stat derivation over player stats (marts-layer math: K/PA etc.,
    * SURVEY §2.8 math note). */
  def playerRates(playerStats: DataFrame): DataFrame =
    playerStats.select(
      col("player_id"), col("last_name"), col("first_name"), col("pa"),
      col("k_percent"), col("bb_percent"),
      round(col("woba").cast("double") - col("xwoba").cast("double"), 3)
        .as("woba_minus_xwoba"),
      round(col("hard_hit_percent") / 100.0 * col("pa"), 1).as("est_hard_hits"))
}
