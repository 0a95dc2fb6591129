package graft.sources

import org.apache.spark.sql.types._

/** Explicit schemas for every input family the reference reads
  * (FIXTURES.md; SURVEY.md §1.3-1.4). inferSchema is never relied on —
  * at 100 TB an inference pass is an extra full scan (SURVEY §4 O15).
  */
object Schemas {

  /** Retrosheet game logs: headerless 161-column CSV (reference data
    * hw5/gl2024.csv, loaded at hw5/load_csv.py:12-17; public Retrosheet
    * game-log layout). Positional names per FIXTURES.md §1. */
  val retrosheet: StructType = {
    def s(n: String) = StructField(n, StringType)
    def i(n: String) = StructField(n, IntegerType)
    val batting = Seq("ab", "hits", "doubles", "triples", "hr", "rbi", "sh",
      "sf", "hbp", "bb", "ibb", "k", "sb", "cs", "gidp", "ci", "lob")
    val pitching = Seq("pitchers", "er", "ter", "wp", "balks")
    val fielding = Seq("po", "assists", "errors", "pb", "dp", "tp")
    def teamStats(p: String) = (batting ++ pitching ++ fielding).map(c => i(s"${p}_$c"))
    val umps = Seq("hp", "1b", "2b", "3b", "lf", "rf")
      .flatMap(u => Seq(s(s"ump_${u}_id"), s(s"ump_${u}_name")))
    def lineup(p: String) = (1 to 9).flatMap(n =>
      Seq(s(s"${p}${n}_id"), s(s"${p}${n}_name"), i(s"${p}${n}_pos")))
    StructType(
      Seq(s("date_str"), i("game_num"), s("day_of_week"),
        s("v_team"), s("v_league"), i("v_game_num"),
        s("h_team"), s("h_league"), i("h_game_num"),
        i("v_score"), i("h_score"), i("outs"), s("day_night"),
        s("completion"), s("forfeit"), s("protest"),
        s("park_id"), i("attendance"), i("duration_min"),
        s("v_line"), s("h_line")) ++
      teamStats("v") ++ teamStats("h") ++ umps ++
      Seq(s("v_mgr_id"), s("v_mgr_name"), s("h_mgr_id"), s("h_mgr_name"),
        s("wp_id"), s("wp_name"), s("lp_id"), s("lp_name"),
        s("sv_id"), s("sv_name"), s("gwrbi_id"), s("gwrbi_name"),
        s("v_sp_id"), s("v_sp_name"), s("h_sp_id"), s("h_sp_name")) ++
      lineup("v") ++ lineup("h") ++
      Seq(s("add_info"), s("acq_info")))
  }

  /** Teams dimension: headerless 4-col CSV (hw5/teams.csv; league is
    * "A"/"N" while game logs carry "AL"/"NL" — join key is abbr only). */
  val teams: StructType = StructType(Seq(
    StructField("abbr", StringType),
    StructField("league", StringType),
    StructField("city", StringType),
    StructField("nickname", StringType)))

  /** Statcast player stats: headered CSV with string-encoded leading-dot
    * decimals (hw5/player_stats_2024.csv, FIXTURES.md §2) — woba/xwoba and
    * avg speeds land as strings and are cast by Readers.playerStats. */
  val playerStatsRaw: StructType = StructType(Seq(
    StructField("last_name, first_name", StringType),
    StructField("player_id", LongType),
    StructField("year", IntegerType),
    StructField("pa", IntegerType),
    StructField("k_percent", DoubleType),
    StructField("bb_percent", DoubleType),
    StructField("woba", StringType),
    StructField("xwoba", StringType),
    StructField("sweet_spot_percent", DoubleType),
    StructField("barrel_batted_rate", DoubleType),
    StructField("hard_hit_percent", DoubleType),
    StructField("avg_best_speed", StringType),
    StructField("avg_hyper_speed", StringType),
    StructField("whiff_percent", DoubleType),
    StructField("swing_percent", DoubleType)))

  /** Article record (ingestion unit, pipeline.py:33-38). */
  val article: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("scraped_at", TimestampType)))

  /** RSS feed item (mlb_pipeline_dag.py:43-59). */
  val rssItem: StructType = StructType(Seq(
    StructField("link", StringType),
    StructField("published", TimestampType),
    StructField("title", StringType)))

  /** MLB Stats API schedule response (nested arrays-of-structs two levels
    * deep, stored verbatim at mlb_schedule_to_gcs.py:40-47). */
  val schedule: StructType = {
    val team = StructType(Seq(
      StructField("team", StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))),
      StructField("score", IntegerType),
      StructField("isWinner", BooleanType)))
    val game = StructType(Seq(
      StructField("gamePk", LongType),
      StructField("gameDate", TimestampType),
      StructField("status", StructType(Seq(StructField("detailedState", StringType)))),
      StructField("teams", StructType(Seq(
        StructField("away", team), StructField("home", team)))),
      StructField("venue", StructType(Seq(
        StructField("id", LongType), StructField("name", StringType))))))
    StructType(Seq(
      StructField("totalGames", IntegerType),
      StructField("dates", ArrayType(StructType(Seq(
        StructField("date", StringType),
        StructField("games", ArrayType(game))))))))
  }

  /** Embeddings index table (vector-store semantics replacing the Chroma
    * collection, FIXTURES.md §6). */
  val embeddingsIndex: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("document", StringType),
    StructField("metadata", article),
    StructField("embedding", ArrayType(FloatType))))
}
