package graft

import java.nio.file.Files

import graft.sources.{Readers, Schemas}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source readers against synthetic fixtures in the reference's file shapes
  * (FIXTURES.md §§1-5) — fixture content is generated here, never copied. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("retrosheet schema has 161 columns and reads a synthetic row") {
    assert(Schemas.retrosheet.fields.length == 161)
    // synthetic game: AAA 7 @ BBB 4, 2024-03-28, park PK001
    val vals = Schemas.retrosheet.fields.map { f =>
      f.name match {
        case "date_str" => "\"20240328\""
        case "game_num" => "\"0\""
        case "day_of_week" => "\"Thu\""
        case "v_team" => "\"AAA\""
        case "h_team" => "\"BBB\""
        case "v_league" | "h_league" => "\"NL\""
        case "v_score" => "7"
        case "h_score" => "4"
        case "outs" => "54"
        case "day_night" => "\"N\""
        case "park_id" => "\"PK001\""
        case "attendance" => "41234"
        case "duration_min" => "175"
        case "completion" | "forfeit" | "protest" => "\"\""
        case n if n.endsWith("_pos") => "5"
        case _ if f.dataType.typeName == "integer" => "1"
        case n => s""""x_$n""""
      }
    }
    val dir = tmp("retro")
    Files.writeString(java.nio.file.Paths.get(s"$dir/gl.csv"),
      vals.mkString(","))
    val df = Readers.retrosheet(spark, s"$dir/gl.csv")
    val row = df.head()
    assert(row.getAs[Int]("v_score") == 7)
    assert(row.getAs[String]("park_id") == "PK001")
    assert(df.select(col("game_date").cast("string")).head.getString(0) == "2024-03-28")
    assert(row.getAs[String]("completion") == null) // "" → null sentinel
  }

  test("teams dimension reads headerless 4-col csv") {
    val dir = tmp("teams")
    Files.writeString(java.nio.file.Paths.get(s"$dir/teams.csv"),
      "AAA,N,Springfield,Isotopes\nBBB,A,Shelbyville,Sharks\n")
    val df = Readers.teams(spark, s"$dir/teams.csv")
    assert(df.count() == 2)
    assert(df.filter(col("abbr") === "AAA").head.getAs[String]("nickname") == "Isotopes")
  }

  test("player stats: leading-dot decimals and quoted doubles cast") {
    val dir = tmp("stats")
    Files.writeString(java.nio.file.Paths.get(s"$dir/ps.csv"),
      "\"last_name, first_name\",player_id,year,pa,k_percent,bb_percent,woba,xwoba,sweet_spot_percent,barrel_batted_rate,hard_hit_percent,avg_best_speed,avg_hyper_speed,whiff_percent,swing_percent\n" +
      "\"Doe, Jane\",123456,2024,600,22.5,8.1,\".349\",\".355\",36.1,9.2,41.0,\"99.64\",\"103.2\",24.9,47.1\n")
    val df = Readers.playerStats(spark, s"$dir/ps.csv")
    val row = df.head()
    assert(row.getAs[java.math.BigDecimal]("woba").doubleValue() == 0.349)
    assert(row.getAs[Double]("avg_best_speed") == 99.64)
    assert(row.getAs[String]("last_name") == "Doe")
    assert(row.getAs[String]("first_name") == "Jane")
  }

  test("schedule JSON relationalizes via double explode") {
    val json =
      """{"totalGames":2,"dates":[{"date":"2024-03-28","games":[
        |{"gamePk":1,"gameDate":"2024-03-28T20:10:00Z","status":{"detailedState":"Final"},
        | "teams":{"away":{"team":{"id":10,"name":"Aways"},"score":3,"isWinner":false},
        |          "home":{"team":{"id":11,"name":"Homes"},"score":5,"isWinner":true}},
        | "venue":{"id":7,"name":"Big Park"}},
        |{"gamePk":2,"gameDate":"2024-03-28T23:10:00Z","status":{"detailedState":"Final"},
        | "teams":{"away":{"team":{"id":12,"name":"Others"},"score":2,"isWinner":true},
        |          "home":{"team":{"id":13,"name":"Locals"},"score":1,"isWinner":false}},
        | "venue":{"id":8,"name":"Small Park"}}]}]}""".stripMargin.replace("\n", "")
    val dir = tmp("sched")
    Files.writeString(java.nio.file.Paths.get(s"$dir/sched.json"), json)
    val games = Readers.scheduleGames(Readers.scheduleRaw(spark, s"$dir/sched.json"))
    assert(games.count() == 2)
    val g1 = games.filter(col("game_pk") === 1).head()
    assert(g1.getAs[String]("venue") == "Big Park")
    assert(g1.getAs[Int]("home_score") == 5)
  }

  test("rss xml parses channel items via xpath") {
    import spark.implicits._
    val xml =
      """<rss><channel>
        |<item><link>http://a</link><pubDate>Thu, 28 Mar 2024 12:00:00 +0000</pubDate><title>One</title></item>
        |<item><link>http://b</link><pubDate>Fri, 29 Mar 2024 13:30:00 +0000</pubDate><title>Two</title></item>
        |</channel></rss>""".stripMargin.replace("\n", "")
    val items = Readers.rssItems(Seq(xml).toDF("xml"))
    assert(items.count() == 2)
    val r = items.filter(col("link") === "http://b").head()
    assert(r.getAs[String]("title") == "Two")
    assert(r.getAs[java.sql.Timestamp]("published").toInstant.toString
      == "2024-03-29T13:30:00Z")
  }

  test("article json reads with explicit schema") {
    val dir = tmp("articles")
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"url":"http://x","title":"T","body":"B","scraped_at":"2024-03-28T10:00:00Z"}""")
    val df = Readers.articles(spark, s"$dir/a.json")
    assert(df.schema == Schemas.article)
    assert(df.head.getAs[String]("title") == "T")
  }
}
