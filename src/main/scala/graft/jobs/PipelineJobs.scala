package graft.jobs

import graft.llm._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch pipeline assembly (SURVEY.md §3.1: the reference's 7-task Airflow
  * DAG collapsed into lazily-planned DataFrame lineages + sinks; XCom
  * process boundaries disappear — stages 1–5 are one lineage, 6–7 are
  * sinks). */
object PipelineJobs {

  /** IngestJob (K1): article records → date-partitioned columnar lake.
    * partitionBy(ingest_date) gives O1 partition pruning to every downstream
    * date-ranged reader. Returns observed job metrics (row count, null-url
    * count, distinct dates) collected DURING the write via the Observation
    * API — no second scan, the production answer to "how much did this run
    * ingest". */
  def ingest(articles: DataFrame, lakePath: String): Map[String, Any] = {
    val obs = new org.apache.spark.sql.Observation("ingest_metrics")
    articles
      .withColumn("ingest_date", to_date(col("scraped_at")))
      .observe(obs,
        count(lit(1)).as("rows_written"),
        sum(when(col("url").isNull, 1).otherwise(0)).as("null_urls"),
        approx_count_distinct(col("ingest_date")).as("approx_dates"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("ingest_date")
      .parquet(lakePath)
    obs.get
  }

  /** ScrapeJob + IngestJob end-to-end (S5 network half + U8 + K1): URL list
    * → throttled batched fetch ([[graft.sources.FetchOps]]) → title/body
    * extraction → date-partitioned lake. Failed fetches are dropped, like
    * the reference's per-article try/except skip (pipeline.py:24-28).
    * `urls` carries (url, scraped_at) — the crawl frontier with its stamp. */
  def ingestFromUrls(urls: DataFrame, fetcher: graft.sources.Fetcher,
      lakePath: String, batchSize: Int = 16,
      throttleMillis: Long = 0L): Map[String, Any] = {
    val fetched = graft.sources.FetchOps.fetchAll(
      urls, "url", "raw_html", fetcher, batchSize, throttleMillis)
      .filter(col("raw_html").isNotNull)
    val articles = fetched
      .withColumn("tb", Parsers.htmlExtractUdf(col("raw_html")))
      .select(col("url"), col("tb.title").as("title"),
        col("tb.body").as("body"), col("scraped_at"))
    ingest(articles, lakePath)
  }

  /** IndexJob (L1+K5/D3): embed new articles, upsert into the embeddings
    * index table by id (delete-before-insert ≡ anti-join + union). */
  def buildOrUpdateIndex(spark: SparkSession, lakePath: String,
      indexPath: String, embedder: Embedder): Unit = {
    val rag = new RagPipeline(embedder, new StubLlm)
    val fresh = rag.buildIndex(
      spark.read.parquet(lakePath).select(col("url").as("id"), col("body").as("document")))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(indexPath)
    val merged =
      if (fs.exists(dst)) {
        val existing = spark.read.parquet(indexPath)
        rag.upsert(existing, fresh)
      } else fresh
    // can't overwrite a path that's still being read: write-to-temp + swap
    // (the same pattern an object store deployment uses for atomic publish)
    val tmp = indexPath + "_tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** RagJob (§3.2): retrieve → assemble → answer over the stored index. */
  def ragAnswer(spark: SparkSession, indexPath: String, query: String,
      embedder: Embedder, llm: LlmClient, k: Int = 3): String = {
    val rag = new RagPipeline(embedder, llm)
    rag.answer(spark.read.parquet(indexPath), query, k)
  }

  /** PodcastJob (L8→L9→U6→L11→K3): generate script from retrieved context,
    * refine, TTS-clean, synthesize audio bytes, write binary artifacts. */
  def podcast(spark: SparkSession, indexPath: String, topic: String,
      outPath: String, embedder: Embedder, llm: LlmClient, tts: TtsClient): DataFrame = {
    import spark.implicits._
    val rag = new RagPipeline(embedder, llm)
    val context = rag.assembleContext(
      rag.retrieve(spark.read.parquet(indexPath), topic, 3))
    val script = llm.completeBatch("generate",
      Seq(s"Write a podcast script about $topic.\nContext:\n$context")).head
    val refined = llm.completeBatch("refine", Seq(script)).head
    val cleaned = Seq(refined).toDF("script")
      .select(Parsers.formatScriptForTts(col("script")).as("script"))
    val withAudio = LlmOps.synthesize(cleaned, "script", "audio", tts)
      .withColumn("generated_at", current_timestamp())
    withAudio.write.mode(SaveMode.Overwrite).parquet(outPath)
    withAudio
  }
}
