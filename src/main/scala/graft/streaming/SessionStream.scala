package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator (SURVEY.md §2.11 ST7 family):
  * gap-based session aggregation per user via flatMapGroupsWithState — the
  * streaming counterpart of AdvancedQueries.q27. State per user is one open
  * session (bounded); closed sessions are emitted when the inactivity gap is
  * exceeded within a batch or on timeout. At scale this is one shuffle on
  * user_id and O(users) state, watermark-bounded.
  *
  * Time is carried as epoch MICROSECONDS (long) end-to-end:
  * java.sql.Timestamp would truncate the parquet micros to millis, breaking
  * the exact-oracle property of q67_stream_sessions.
  */
object SessionStream {

  /** ts carries the watermarked TimestampType column through to the
    * stateful operator (EventTimeTimeout's analyzer check needs it in
    * scope); the session logic itself uses only the exact micros ts_us. */
  final case class Event(user_id: Long, ts_us: Long, value: Double,
      ts: java.sql.Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Int, total: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, total_value: Double)

  val gapUs: Long = 30L * 60 * 1000000

  /** Per-user session folding: events arrive (within a batch) unordered, so
    * sort by ts; emit every closed session, keep the open one in state.
    * With `eventTimeTimeout`, the open session arms a timeout at last+gap so
    * the watermark closes tails (see sessionsWithTimeout). */
  def foldSessionsImpl(eventTimeTimeout: Boolean)(userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(_.ts_us)
    var open = state.getOption
    val out = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val t = e.ts_us
      open match {
        case Some(s) if t - s.last <= gapUs =>
          open = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
        case Some(s) =>
          out += SessionOut(userId, s.start, s.last, s.n, s.total)
          open = Some(OpenSession(t, t, 1, e.value))
        case None =>
          open = Some(OpenSession(t, t, 1, e.value))
      }
    }
    if (state.hasTimedOut) {
      open.foreach(s => out += SessionOut(userId, s.start, s.last, s.n, s.total))
      state.remove()
    } else {
      open.foreach { s =>
        state.update(s)
        // GroupState timeouts are millisecond-granular
        if (eventTimeTimeout) state.setTimeoutTimestamp((s.last + gapUs) / 1000)
      }
    }
    out.result().iterator
  }

  def foldSessions(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[SessionOut] =
    foldSessionsImpl(eventTimeTimeout = false)(userId, events, state)

  private def toEvents(spark: SparkSession, events: DataFrame): Dataset[Event] = {
    import spark.implicits._
    events.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("value"), col("ts")).as[Event]
  }

  /** Streaming session aggregation over an events stream. NoTimeout by
    * default: the open tail session per user stays in state (a live deploy
    * closes tails with EventTimeTimeout + watermark; ProcessingTimeTimeout
    * is avoided because it makes the engine run continuous empty batches,
    * which never lets processAllAvailable-style drains finish). */
  def sessions(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    toEvents(spark, events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(foldSessions)
  }

  /** Live-deploy variant: EventTimeTimeout + watermark closes open tail
    * sessions once the watermark passes last+gap — the output converges to
    * exactly the batch sessionization (q27) when the source drains. Spark
    * runs a no-data batch after the watermark advances, which is what fires
    * the timeouts. State stays O(users), eviction is watermark-bounded. */
  def sessionsWithTimeout(spark: SparkSession, events: DataFrame,
      watermark: String = "0 seconds"): Dataset[SessionOut] = {
    import spark.implicits._
    toEvents(spark, events.withWatermark("ts", watermark))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        foldSessionsImpl(eventTimeTimeout = true))
  }
}
