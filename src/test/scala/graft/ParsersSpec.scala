package graft

import graft.llm.Parsers
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parser surface U1–U8 against fixture strings in the reference's observed
  * emit formats (FIXTURES.md §7). */
class ParsersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("U1/U2: news blocks parse") {
    val txt =
      """HEADLINE: Dodgers win opener
        |CONTENT: A late homer sealed it.
        |SOURCE: mlb.com
        |
        |HEADLINE: Trade rumors swirl
        |CONTENT: Deadline approaching.
        |SOURCE: espn.com""".stripMargin
    val items = Parsers.parseNewsItems(txt)
    assert(items.size == 2)
    assert(items.head.headline == "Dodgers win opener")
    assert(items(1).source == "espn.com")
    assert(Parsers.parseNewsItems("no structure here").isEmpty)
  }

  test("U3: section parsing (ALL-CAPS and short-colon headers)") {
    val txt =
      """GAME SUMMARY
        |Tight game through seven.
        |Bullpen held on.
        |Key Players:
        |Ohtani homered twice.""".stripMargin
    val m = Parsers.parseSections(txt)
    assert(m("GAME SUMMARY") == "Tight game through seven. Bullpen held on.")
    assert(m("Key Players") == "Ohtani homered twice.")
  }

  test("U4: bullet extraction") {
    val txt =
      """FAN REACTIONS:
        |- Unbelievable comeback!
        |- Fire the manager.
        |not a bullet""".stripMargin
    assert(Parsers.parseBullets(txt) == Seq("Unbelievable comeback!", "Fire the manager."))
  }

  test("U5: plan parsing") {
    val txt =
      """Topic: Yankees losing streak
        |Data Sources: news, game data
        |Agents: NewsGatheringAgent, GameAnalysisAgent
        |Storylines: slump
        |and recovery
        |Notes: keep it short""".stripMargin
    val p = Parsers.parsePlan(txt)
    assert(p.topic == "Yankees losing streak")
    assert(p.agents == "NewsGatheringAgent, GameAnalysisAgent")
    assert(p.storylines == "slump and recovery")
    assert(p.notes == "keep it short")
  }

  test("U8: html extract (first h1, concatenated p)") {
    val html = "<html><h1 class=\"t\">Big Win</h1><p>First.</p><div><p>Second <b>bold</b>.</p></div></html>"
    val (t, b) = Parsers.htmlExtract(html)
    assert(t == "Big Win")
    assert(b == "First. Second bold.")
    assert(Parsers.htmlExtract("<html></html>")._1 == "No Title")
  }

  test("U6: TTS script cleanup drops separator lines (expression-only)") {
    import spark.implicits._
    val df = Seq("Welcome!\n***\nLine two.\n---\n  \nBye.").toDF("script")
    val out = df.select(Parsers.formatScriptForTts(col("script"))).head.getString(0)
    assert(out == "Welcome! Line two. Bye.")
  }

  test("F7: tts normalization expands abbreviations, splits ordinals, drops brackets") {
    import spark.implicits._
    val df = Seq("MLB recap [intro] the 3rd HR of the game").toDF("s")
    val out = df.select(Parsers.ttsNormalize(col("s"))).head.getString(0)
    assert(out == "M L B recap  the 3 rd home run of the game")
  }

  test("K6: stage view recomputes, mart table materializes") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    graft.jobs.Warehouse.stageView("stg_test", df.filter(col("id") > 1))
    assert(spark.table("stg_test").count() == 1)
    // clean both catalog entry and any stale location from a prior JVM
    spark.sql("DROP TABLE IF EXISTS mart_test")
    val loc = new java.io.File("spark-warehouse/mart_test")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(loc)
    }
    graft.jobs.Warehouse.martTable(spark, "mart_test", df)
    assert(graft.jobs.Warehouse.table(spark, "mart_test").count() == 2)
  }

  test("K6+: incremental mart refresh touches only fresh partitions") {
    import spark.implicits._
    val mart = java.nio.file.Files.createTempDirectory("mart_inc").toString
    def agg(src: org.apache.spark.sql.DataFrame) =
      src.groupBy(col("d"), col("k")).agg(sum(col("v")).cast("long").as("total"))
    // initial build: days 1 and 2
    val v1 = Seq(("d1", "a", 1L), ("d1", "a", 2L), ("d2", "b", 5L))
      .toDF("d", "k", "v")
    graft.jobs.Warehouse.refreshIncremental(spark, mart, v1, "d", agg)
    // incremental: day 2 restated, day 3 new — day 1 must not be rewritten
    val day1FileBefore = new java.io.File(s"$mart/d=d1").listFiles
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq
    val fresh = Seq(("d2", "b", 7L), ("d3", "c", 9L)).toDF("d", "k", "v")
    graft.jobs.Warehouse.refreshIncremental(spark, mart, fresh, "d", agg)
    val got = spark.read.parquet(mart).collect()
      .map(r => (r.getAs[String]("d"), r.getAs[String]("k"), r.getAs[Long]("total")))
      .toSet
    assert(got == Set(("d1", "a", 3L), ("d2", "b", 7L), ("d3", "c", 9L)))
    val day1FileAfter = new java.io.File(s"$mart/d=d1").listFiles
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSeq
    assert(day1FileAfter == day1FileBefore, "untouched partition must not be rewritten")
  }

  test("K6+: compaction collapses small files, preserves data and layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    // simulate micro-batch debris: many small files per partition
    (1 to 5).foreach { b =>
      Seq(("d1", b.toLong), ("d2", b.toLong)).toDF("d", "v")
        .repartition(4)
        .write.mode("append").partitionBy("d").parquet(dir)
    }
    def files(p: String) = new java.io.File(p).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files(s"$dir/d=d1").length > 1, "debris expected before compaction")
    val before = spark.read.parquet(dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    graft.jobs.Warehouse.compact(spark, dir, "d")
    assert(files(s"$dir/d=d1").length == 1 && files(s"$dir/d=d2").length == 1)
    val after = spark.read.parquet(dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(after == before)
  }

  test("S-robust: PERMISSIVE CSV quarantines bad rows instead of failing") {
    val dir = java.nio.file.Files.createTempDirectory("quarantine")
    java.nio.file.Files.write(dir.resolve("in.csv"),
      "1,alpha\nnot_a_number,beta\n3,gamma\n".getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id INT, name STRING")
    val (clean, quarantine) =
      graft.sources.Readers.csvWithQuarantine(spark, schema, dir.toString)
    assert(clean.count() == 2)
    assert(clean.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    val bad = quarantine.collect().map(_.getString(0))
    assert(bad.toSeq == Seq("not_a_number,beta"))
  }

  test("U7: plan→markdown") {
    import spark.implicits._
    val df = Seq(("T", "ds", "ag", "st", "no")).toDF("t", "d", "a", "s", "n")
    val md = df.select(Parsers.formatPlanAsMarkdown(
      col("t"), col("d"), col("a"), col("s"), col("n"))).head.getString(0)
    assert(md.startsWith("# Podcast Plan: T"))
    assert(md.contains("## Storylines\nst"))
  }

  test("parser UDFs run inside a DataFrame plan") {
    import spark.implicits._
    val df = Seq("HEADLINE: A\nCONTENT: B\nSOURCE: C").toDF("txt")
    val exploded = df.select(explode(Parsers.parseNewsItemsUdf(col("txt"))).as("item"))
      .select("item.headline", "item.content", "item.source")
    assert(exploded.head.getString(0) == "A")
  }
}
