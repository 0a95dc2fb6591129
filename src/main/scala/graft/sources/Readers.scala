package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source readers (SURVEY.md §2.1 S1–S8): explicit-schema CSV/JSON scans
  * plus the relationalizing transforms for the nested schedule JSON.
  */
object Readers {

  /** S1: headered CSV with schema inference — exploratory path only. */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S2: Retrosheet game logs — headerless, explicit 161-col schema,
    * "" and "(none)" as null sentinels, derived typed game_date. */
  def retrosheet(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.retrosheet)
      .option("header", "false")
      .option("nullValue", "")
      .csv(path)
      .withColumn("game_date", to_date(col("date_str"), "yyyyMMdd"))

  /** S2: teams dimension (broadcast-sized: 32 rows). */
  def teams(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.teams).option("header", "false").csv(path)

  /** Corrupt-tolerant CSV scan (ingestion robustness at scale: a bad row
    * among billions must quarantine, not kill the job): PERMISSIVE mode
    * routes unparseable lines into `_corrupt_record`; callers split the
    * frame into clean rows and a quarantine side. */
  def csvWithQuarantine(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      path: String, header: Boolean = false): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read.schema(withCorrupt)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .cache() // Spark requires materializing before filtering _corrupt_record
    val clean = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val quarantine = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, quarantine)
  }

  /** Statcast player stats with the string-decimal cleanup casts
    * (".349" → 0.349; FIXTURES.md §2): split name, decimal/double casts. */
  def playerStats(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(Schemas.playerStatsRaw)
      .option("header", "true").csv(path)
    raw
      .withColumn("last_name",
        trim(split(col("`last_name, first_name`"), ",").getItem(0)))
      .withColumn("first_name",
        trim(split(col("`last_name, first_name`"), ",").getItem(1)))
      .withColumn("woba",
        regexp_replace(col("woba"), "^\\.", "0.").cast("decimal(4,3)"))
      .withColumn("xwoba",
        regexp_replace(col("xwoba"), "^\\.", "0.").cast("decimal(4,3)"))
      .withColumn("avg_best_speed", col("avg_best_speed").cast("double"))
      .withColumn("avg_hyper_speed", col("avg_hyper_speed").cast("double"))
      .drop("last_name, first_name")
  }

  /** S7/S3 landing: article batches / schedule responses as JSON files. */
  def articles(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.article).json(path)

  def scheduleRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.schedule).json(path)

  /** Relationalize the nested schedule: explode(dates) → explode(games) →
    * flat game rows (SURVEY §1.1.2). */
  def scheduleGames(raw: DataFrame): DataFrame =
    raw
      .select(explode(col("dates")).as("d"))
      .select(col("d.date").as("date"), explode(col("d.games")).as("g"))
      .select(
        col("date"),
        col("g.gamePk").as("game_pk"),
        col("g.gameDate").as("game_ts"),
        col("g.status.detailedState").as("state"),
        col("g.teams.away.team.name").as("away_team"),
        col("g.teams.away.score").as("away_score"),
        col("g.teams.home.team.name").as("home_team"),
        col("g.teams.home.score").as("home_score"),
        col("g.venue.name").as("venue"))

  /** S4: RSS/XML feed parse via XPath built-ins (reference uses feedparser /
    * ElementTree ./channel/item at mlb_agent_framework_dag.py:60-61).
    * Input: one XML document string per row in column `xml`. */
  def rssItems(feed: DataFrame): DataFrame =
    feed.select(
        xpath(col("xml"), lit("/rss/channel/item/link/text()")).as("links"),
        xpath(col("xml"), lit("/rss/channel/item/pubDate/text()")).as("pubs"),
        xpath(col("xml"), lit("/rss/channel/item/title/text()")).as("titles"))
      .select(posexplode(arrays_zip(col("links"), col("pubs"), col("titles"))).as(Seq("i", "z")))
      .select(
        col("z.links").as("link"),
        // RFC-822 pubDate; Spark 3+'s parser rejects 'EEE', so strip the
        // redundant day-of-week prefix before parsing.
        to_timestamp(regexp_replace(col("z.pubs"), "^[A-Za-z]{3}, ", ""),
          "dd MMM yyyy HH:mm:ss Z").as("published"),
        col("z.titles").as("title"))
}
