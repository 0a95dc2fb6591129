package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{EventsStream, SessionStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming sessions must agree with the batch sessionization
  * (q27) on session counts, modulo the final open session per user (which
  * streaming holds in state until timeout). */
class SessionStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming gap sessions match batch session count minus open tails") {
    val dir = Files.createTempDirectory("sess_stream")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val streaming = SessionStream.sessions(spark,
      EventsStream.readEvents(spark, dir.toString))
    val got = EventsStream.runToMemory(spark, streaming.toDF(), "sessions_test", "append")

    val batch = SparkEntry.queries("q27_sessionize")(spark, TestSpark.sf0001)
    val batchTotal = batch.agg(sum(col("n_sessions"))).head.getLong(0)
    val users = batch.count()
    val emitted = got.count()
    // every user's LAST session stays open in state (single batch, no
    // timeout fires during processAllAvailable) → emitted = total - users
    assert(emitted == batchTotal - users,
      s"emitted=$emitted batchTotal=$batchTotal users=$users")
    // per-session invariants
    val bad = got.filter(col("n_events") <= 0 || col("end_us") < col("start_us")).count()
    assert(bad == 0)
  }

  test("EventTimeTimeout closes tails: streaming sessions equal batch exactly") {
    val dir = Files.createTempDirectory("sess_stream_to")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val streaming = SessionStream.sessionsWithTimeout(spark,
      EventsStream.readEvents(spark, dir.toString))
    val got = EventsStream.runToMemory(spark, streaming.toDF(), "sessions_to_test", "append")

    val batch = SparkEntry.queries("q27_sessionize")(spark, TestSpark.sf0001)
    val batchTotal = batch.agg(sum(col("n_sessions"))).head.getLong(0)
    // the watermark (max event time) closes every tail whose gap has passed;
    // only tails within `gap` of the stream's end stay open
    val emitted = got.count()
    assert(emitted >= batchTotal - batch.count() && emitted <= batchTotal,
      s"emitted=$emitted batchTotal=$batchTotal")
    // per-user session counts of CLOSED sessions never exceed batch totals
    val perUser = got.groupBy(col("user_id")).count()
      .join(batch, "user_id")
      .filter(col("count") > col("n_sessions")).count()
    assert(perUser == 0)
  }

  test("idempotent foreachBatch sink: replaying a batch does not duplicate rows") {
    val dir = Files.createTempDirectory("idem_sink")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val out = Files.createTempDirectory("idem_out").toString
    EventsStream.runToParquet(
      EventsStream.readEvents(spark, dir.toString), out)
    val expected = Tables.events(spark, TestSpark.sf0001).count()
    assert(spark.read.parquet(out).count() == expected)
    // replay batch 0 (simulates a retry after an uncommitted epoch):
    // dynamic partition overwrite rewrites batch_id=0 instead of appending
    EventsStream.writeBatchIdempotent(
      Tables.events(spark, TestSpark.sf0001), 0L, out)
    assert(spark.read.parquet(out).count() == expected,
      "replay must overwrite, not duplicate")
  }

  test("stream-stream interval join matches the batch equivalent") {
    import graft.streaming.StreamJoins
    val dir = Files.createTempDirectory("ss_join")
    Files.copy(Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    def side(t: String) =
      EventsStream.readEvents(spark, dir.toString).filter(col("event_type") === t)
    val joined = StreamJoins.viewPurchaseAttribution(side("view"), side("purchase"))
    val got = EventsStream.runToMemory(spark, joined, "ss_join_test", "append")

    val ev = Tables.events(spark, TestSpark.sf0001)
    val bv = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id").as("p_user"))
    val batchCount = bv.join(bp,
      col("v_user") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 hour")).count()
    assert(got.count() == batchCount, s"stream=${got.count()} batch=$batchCount")
    assert(batchCount > 0, "fixture should produce at least one attribution pair")
  }
}
