package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming semantics for the ingestion cadence (SURVEY.md §2.11
  * ST1–ST5): the reference's "stream" is a daily Airflow micro-batch with a
  * today-only filter and id-upsert; here that becomes a file-source stream
  * with an explicit watermark + keyed dedup + tumbling-window aggregation —
  * the documented late/duplicate policy the reference leaves implicit
  * (SURVEY §7.4.7).
  */
object EventsStream {

  /** events schema with `ts` as raw LONG — the shape of BOTH the legacy
    * TIMESTAMP(NANOS) file read under nanosAsLong and spec-staged files
    * that store epoch micros directly. */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The events file's `ts` physical type has drifted across test-data
    * generations (TIMESTAMP(NANOS)→nanos LONG, then micros with
    * isAdjustedToUTC=false→TIMESTAMP_NTZ). A streaming source needs its
    * schema declared up front, so peek at the batch-read schema of the
    * same file and pair it with the matching normalizer — one place that
    * tracks the drift for every streaming query ([[graft.Tables.load]] is
    * the batch twin). */
  private def readNormalized(spark: SparkSession, peekPath: String,
      streamDir: String, glob: Option[String]): DataFrame = {
    val batchTs = spark.read.parquet(peekPath).schema("ts").dataType
    val schema = StructType(eventsRawSchema.map {
      case f if f.name == "ts" => f.copy(dataType = batchTs)
      case f => f
    })
    val reader = spark.readStream.schema(schema)
    glob.foreach(g => reader.option("pathGlobFilter", g))
    val raw = reader.parquet(streamDir)
    batchTs match {
      case LongType => // legacy nanos-as-long
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // naive micros; session tz is pinned UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Streaming read of an events parquet path glob. */
  def readEvents(spark: SparkSession, pathGlob: String): DataFrame =
    readNormalized(spark, pathGlob, pathGlob, None)

  /** Streaming read of `events.parquet` inside a multi-table directory
    * (file sources require a directory path; pathGlobFilter selects the one
    * table file). */
  def readEventsDir(spark: SparkSession, dir: String): DataFrame =
    readNormalized(spark, s"$dir/events.parquet", dir,
      Some("events.parquet"))

  /** ST4: watermarked keyed dedup — duplicates within the watermark horizon
    * are dropped by event_id (the reference's URL-keyed upsert semantics). */
  def dedup(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** ST2: tumbling-window counts per event type after dedup. State is
    * bounded by the watermark; at scale this is one shuffle keyed on
    * (window, event_type) with partial aggregation. */
  def hourlyCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    dedup(events, watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("total_value"))

  /** ST5 made concrete: an idempotent micro-batch sink. Each batch lands in
    * its own batch_id=N partition under dynamic partition overwrite, so a
    * replayed batch (Spark retry, or a restart re-emitting the last
    * uncommitted batch) rewrites its partition instead of appending
    * duplicates — the standard foreachBatch exactly-once recipe. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Drain a stream through the idempotent sink to completion. */
  def runToParquet(streaming: DataFrame, path: String): Unit = {
    val q = streaming.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) => writeBatchIdempotent(batch, batchId, path))
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Run a streaming query to completion against static input files
    * (Trigger.AvailableNow semantics via processAllAvailable) and return the
    * materialized result from the memory sink. */
  def runToMemory(spark: SparkSession, streaming: DataFrame, name: String,
      outputMode: String = "append"): DataFrame = {
    // a previous drain under the same name leaves its memory table behind;
    // drop it so reruns in one session don't fail at start()
    spark.catalog.dropTempView(name)
    val q = streaming.writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
