package graft

import java.nio.file.{Files, Paths}

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics (ST1–ST5) driven by the static events
  * parquet: the streaming result must equal the equivalent batch query.
  * The file stream source requires a directory, so the single parquet file
  * is staged into a temp dir. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming hourly counts equal the batch computation (sf0.001)") {
    val streaming = EventsStream.hourlyCounts(EventsStream.readEvents(spark, eventsDir))
    val got = EventsStream.runToMemory(spark, streaming, "hourly_test", "complete")
      .select(col("h"), col("event_type"), col("n"))
    val expected = Tables.events(spark, TestSpark.sf0001)
      .dropDuplicates("event_id")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // compare as sets (exceptAll between a memory-sink table and an agg plan
    // trips INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1's analyzer)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val g = canon(got)
    assert(g.nonEmpty)
    assert(g == canon(expected))
  }

  test("streaming session_window drain equals batch session_window minus open tail") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.readEvents(spark, eventsDir)
        .withWatermark("ts", "1 day")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("session_window.start").as("st"),
          col("session_window.end").as("en"), col("user_id"), col("n")),
      "session_window_test", "append")
    val ev = Tables.events(spark, TestSpark.sf0001)
    val horizon = ev.agg(max(col("ts"))).head.getTimestamp(0).toInstant
      .minusSeconds(86400)
    val batch = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("st"),
        col("session_window.end").as("en"), col("user_id"), col("n"))
      .filter(col("en") <= lit(java.sql.Timestamp.from(horizon)))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
        .toSet
    val g = canon(streamed)
    assert(g.nonEmpty)
    assert(g == canon(batch))
  }

  test("streaming curation drain: content dedup + quality gate equals batch") {
    // the curation stack run AS A STREAM: documents arrive as files, exact
    // content dedup keeps one doc per fingerprint (stateful), the length
    // gate drops the rest — the shape of a continuously-ingesting corpus
    val docSchema = Tables.documents(spark, TestSpark.sf0001).schema
    val stream = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(TestSpark.sf0001)
      .withColumn("fp", md5(col("text")))
      .dropDuplicates("fp")
      .filter(size(split(col("text"), " ")).between(20, 80))
      .select(col("fp"))
    val got = EventsStream.runToMemory(spark, stream, "stream_curation", "append")
      .collect().map(_.getString(0)).toSeq
    // which doc_id survives per fingerprint is read-order-dependent; the
    // surviving fingerprint SET is deterministic
    val expected = Tables.documents(spark, TestSpark.sf0001)
      .filter(size(split(col("text"), " ")).between(20, 80))
      .select(md5(col("text")).as("fp")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(got.nonEmpty)
    assert(got.length == got.distinct.length, "stream emitted a duplicate fp")
    assert(got.sorted == expected.sorted)
  }

  test("watermarked dedup drops duplicate event_ids") {
    val deduped = EventsStream.dedup(EventsStream.readEvents(spark, eventsDir))
    val got = EventsStream.runToMemory(spark, deduped, "dedup_test", "append")
    val distinctIds = Tables.events(spark, TestSpark.sf0001)
      .select("event_id").distinct().count()
    assert(got.count() == distinctIds)
  }
}
