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

  test("checkpointed restart: watermark + dedup + window state survive, sink stays exactly-once") {
    // stage the corpus as two time-ordered file arrivals: run the watermarked
    // dedup+window pipeline over file 1 with a checkpoint, STOP the query,
    // stage file 2, and restart a fresh query object from the same
    // checkpoint — the recovered state must make the final sink equal the
    // single-run batch result (ST5: restart is invisible in the output)
    val batchEv = Tables.events(spark, TestSpark.sf0001)
    val cut = batchEv.agg(
      expr("percentile_approx(unix_micros(ts), 0.5, 10000)")).head.getLong(0)
    val srcDir = Files.createTempDirectory("restart_src")
    val ckpt = Files.createTempDirectory("restart_ckpt").toString
    val outPath = Files.createTempDirectory("restart_out").toString + "/out"
    // file1 = older half, file2 = newer half → file2 never carries data
    // older than file1's watermark (no late-drop asymmetry vs batch)
    batchEv.filter(unix_micros(col("ts")) <= cut)
      .withColumn("ts", unix_micros(col("ts"))) // raw long like the source file
      .coalesce(1).write.mode("overwrite").parquet(srcDir.toString + "/batch1")
    def stage(n: Int): Unit = {
      val listing = Files.list(Paths.get(srcDir.toString + s"/batch$n"))
      val part = try listing
        .filter(p => p.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
      Files.copy(part, Paths.get(srcDir.toString, s"events$n.parquet"))
    }
    stage(1)
    def run(): Unit = {
      val hourly = EventsStream.hourlyCounts(
          spark.readStream.schema(EventsStream.eventsRawSchema)
            .option("pathGlobFilter", "events*.parquet")
            .parquet(srcDir.toString)
            // staged files carry epoch MICROS (unix_micros below), not the
            // source table's nanos — convert directly
            .withColumn("ts", timestamp_micros(col("ts"))))
        .select(col("h"), col("event_type"), col("n"))
      val q = hourly.writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outPath)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run() // first run: older half, then query STOPS
    batchEv.filter(unix_micros(col("ts")) > cut)
      .withColumn("ts", unix_micros(col("ts")))
      .coalesce(1).write.mode("overwrite").parquet(srcDir.toString + "/batch2")
    stage(2)
    run() // restart from checkpoint: state + watermark recovered
    val got = spark.read.parquet(outPath)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    // exactly-once: no window/event_type emitted twice across the restart
    assert(got.length == got.distinct.length, "duplicate emission after restart")
    // equals the single-run batch computation under the append-mode rule
    val horizon = batchEv.agg(max(col("ts"))).head.getTimestamp(0).toInstant
      .minusSeconds(86400)
    val expected = batchEv.dropDuplicates("event_id")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .filter(col("h") + expr("INTERVAL 1 HOUR") <=
        lit(java.sql.Timestamp.from(horizon)))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    assert(got.toSet == expected.toSet)
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

  test("misra-gries aggregation state survives a checkpointed restart") {
    import org.apache.spark.sql.{DataFrame, Row}
    // k >= distinct keys makes the MG buffer EXACT per-type counts (no
    // decrements), so recovery is provable to the bit: drain half the
    // events, stop, stage the rest, restart from the checkpoint — the
    // final sketch must equal the batch counts over ALL events; losing
    // the state-store buffer would visibly halve them
    val srcDir = Files.createTempDirectory("mg_restart_src")
    val ckpt = Files.createTempDirectory("mg_restart_ckpt").toString
    val batchEv = Tables.events(spark, TestSpark.sf0001)
    def stageSlice(n: Int, pred: org.apache.spark.sql.Column): Unit = {
      val tmp = srcDir.resolve(s"batch$n")
      batchEv.filter(pred).select(col("event_type"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing
        .filter(p => p.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
      Files.copy(part, srcDir.resolve(s"events$n.parquet"))
    }
    @volatile var latest: Map[String, Long] = Map.empty
    def run(): Unit = {
      val mg = udaf(graft.functions.HeavyHitters(8))
      val agg = spark.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType))))
        .option("pathGlobFilter", "events*.parquet")
        .parquet(srcDir.toString)
        .agg(mg(col("event_type")).as("hh"))
      val q = agg.writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.collect().headOption.foreach { r: Row =>
            latest = r.getMap[String, Long](0).toMap
          }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    stageSlice(1, col("event_id") % 2 === 0)
    run() // first half drained; buffer checkpointed; query STOPS
    val halfTotal = latest.values.sum
    stageSlice(2, col("event_id") % 2 =!= 0)
    run() // restart: the recovered buffer must carry the first half
    val exact = batchEv.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest == exact,
      s"restart lost sketch state: got $latest expected $exact")
    assert(halfTotal < latest.values.sum, "second run added nothing")
  }

  test("IngestHarness.drain re-invocation over an existing base restages idempotently") {
    import graft.streaming.IngestHarness
    val base = Files.createTempDirectory("drain_retry")
    val slices = Seq(
      spark.range(3).select(col("id")),
      spark.range(3, 6).select(col("id")))
    var folded = List.empty[Set[Long]]
    def fold(b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Unit =
      folded = folded :+ b.collect().map(_.getLong(0)).toSet
    IngestHarness.drain(spark, base, slices, fold)
    assert(folded == List(Set(0L, 1L, 2L), Set(3L, 4L, 5L)))
    // the crash-recovery scenario the checkpoint exists for: a retry of
    // the SAME drain over the existing base must restage (not die on
    // FileAlreadyExists) and the checkpoint must keep already-processed
    // slices from re-folding
    IngestHarness.drain(spark, base, slices, fold)
    assert(folded.length == 2, s"retry re-folded processed slices: $folded")
  }

  test("watermarked dedup drops duplicate event_ids") {
    val deduped = EventsStream.dedup(EventsStream.readEvents(spark, eventsDir))
    val got = EventsStream.runToMemory(spark, deduped, "dedup_test", "append")
    val distinctIds = Tables.events(spark, TestSpark.sf0001)
      .select("event_id").distinct().count()
    assert(got.count() == distinctIds)
  }
}
