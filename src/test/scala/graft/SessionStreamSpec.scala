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
    val bad = got.filter(col("n_events") <= 0 || col("end") < col("start")).count()
    assert(bad == 0)
  }
}
