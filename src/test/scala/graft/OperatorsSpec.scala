package graft

import java.nio.file.Files

import graft.jobs.PipelineJobs
import graft.llm.{FeatureHashEmbedder, StubLlm, StubTts}
import graft.operators.{LangId, Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-1 wave-2 operators: ANN LSH, multimodal stubs, lang-id, pipeline
  * jobs (lake sinks + index upsert + podcast assembly). */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ANN top-k: deterministic, k rows, sorted sims, reasonable recall") {
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val query = emb.filter(col("vec_id") === 1)
      .head.getAs[Seq[Float]]("embedding").toArray
    val exact = emb
      .select(col("vec_id"),
        graft.functions.CosineSimilarity(col("embedding"),
          array(query.map(lit): _*)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(emb, "embedding", "vec_id", query, 10)
      .collect()
    assert(ann.length == 10)
    val sims = ann.map(_.getDouble(1))
    assert(sims.sorted.reverse.toSeq == sims.toSeq)
    val recall = ann.map(_.getLong(0)).count(exact.contains).toDouble / 10
    assert(recall >= 0.2, s"ann recall=$recall")
    // determinism
    val again = Similarity.annTopK(emb, "embedding", "vec_id", query, 10).collect()
    assert(again.map(_.getLong(0)).toSeq == ann.map(_.getLong(0)).toSeq)
  }

  test("multimodal: feature extraction over binary payloads, batched") {
    val media = Multimodal.syntheticMedia(spark, 9)
    val feats = Multimodal.extractFeatures(media, batchSize = 2)
    assert(feats.count() == 9)
    val f = feats.select("features").head.getSeq[Float](0)
    assert(f.length == 4)
    // deterministic per payload
    val again = Multimodal.extractFeatures(media, batchSize = 4)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    feats.select("media_id", "features").collect().foreach { r =>
      assert(again(r.getLong(0)) == r.getSeq[Float](1))
    }
  }

  test("multimodal: frame sampling emits n rows per video") {
    val media = Multimodal.syntheticMedia(spark, 9) // 3 videos
    val frames = Multimodal.sampleFrames(media, n = 3)
    assert(frames.count() == 9)
    assert(frames.select("frame_idx").distinct().count() == 3)
  }

  test("lang-id predicts constructed samples") {
    import spark.implicits._
    val df = Seq(
      ("the cat is in the house and that is fine", "en"),
      ("el gato y la casa de los perros en madrid", "es"),
      ("le chat et les maisons des amis est grand", "fr"),
      ("der hund und die katze ist von den bergen", "de"),
      ("zzz qqq xxx", "und"))
      .toDF("text", "expected")
    val got = df.withColumn("pred", LangId.predict(col("text")))
    assert(got.filter(col("pred") =!= col("expected")).count() == 0)
  }

  test("url ingest: throttled batched fetch -> html extract -> partitioned lake") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fetch").toString
    val fixtures = Map(
      "http://x/1" -> "<html><h1>Game One</h1><p>phillies win</p><p>big night</p></html>",
      "http://x/2" -> "<html><h1>Game Two</h1><p>pitchers duel</p></html>")
    val urls = Seq(
      ("http://x/1", "2024-04-01 09:00:00"),
      ("http://x/2", "2024-04-02 09:00:00"),
      ("http://x/missing", "2024-04-02 10:00:00"))
      .toDF("url", "scraped_at")
      .withColumn("scraped_at", to_timestamp(col("scraped_at")))
    val metrics = PipelineJobs.ingestFromUrls(
      urls, new graft.sources.FixtureFetcher(fixtures), s"$dir/lake")
    // the failed fetch is skipped; the two fixture pages land partitioned
    assert(metrics("rows_written") == 2L)
    assert(new java.io.File(s"$dir/lake/ingest_date=2024-04-01").exists())
    val lake = spark.read.parquet(s"$dir/lake")
    val a1 = lake.filter(col("url") === "http://x/1").head
    assert(a1.getAs[String]("title") == "Game One")
    assert(a1.getAs[String]("body") == "phillies win big night")
    // per-partition throttle: 3 urls, batch 1, one partition, 150 ms between
    // batches → at least two sleeps (sleep guarantees a minimum, so this
    // lower bound is timing-stable)
    val t0 = System.nanoTime()
    graft.sources.FetchOps.fetchAll(urls.repartition(1), "url", "raw",
      new graft.sources.FixtureFetcher(fixtures),
      batchSize = 1, throttleMillis = 150).count()
    assert((System.nanoTime() - t0) / 1e6 >= 300,
      "expected >= 2 inter-batch throttle sleeps")
  }

  test("pipeline jobs: ingest -> index -> upsert -> rag -> podcast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jobs").toString
    val embedder = new FeatureHashEmbedder(64)
    val articles = Seq(
      ("http://a", "Title A", "phillies win the pennant race", "2024-03-28 10:00:00"),
      ("http://b", "Title B", "pitching struggles continue again", "2024-03-29 11:00:00"))
      .toDF("url", "title", "body", "scraped_at")
      .withColumn("scraped_at", to_timestamp(col("scraped_at")))
    val metrics = PipelineJobs.ingest(articles, s"$dir/lake")
    // partition layout exists (O1 pruning)
    assert(new java.io.File(s"$dir/lake/ingest_date=2024-03-28").exists())
    // observed metrics collected during the write, no second scan
    assert(metrics("rows_written") == 2L && metrics("null_urls") == 0L)

    PipelineJobs.buildOrUpdateIndex(spark, s"$dir/lake", s"$dir/index", embedder)
    assert(spark.read.parquet(s"$dir/index").count() == 2)

    // upsert: re-ingest one changed + one new article
    val v2 = Seq(
      ("http://a", "Title A2", "phillies clinch the division title", "2024-03-30 09:00:00"),
      ("http://c", "Title C", "rookie makes his debut tonight", "2024-03-30 10:00:00"))
      .toDF("url", "title", "body", "scraped_at")
      .withColumn("scraped_at", to_timestamp(col("scraped_at")))
    PipelineJobs.ingest(v2, s"$dir/lake2")
    PipelineJobs.buildOrUpdateIndex(spark, s"$dir/lake2", s"$dir/index", embedder)
    val index = spark.read.parquet(s"$dir/index")
    assert(index.count() == 3)
    assert(index.filter(col("id") === "http://a").head.getAs[String]("document")
      .contains("clinch"))

    val ans = PipelineJobs.ragAnswer(spark, s"$dir/index",
      "phillies division title", embedder, new StubLlm)
    assert(ans.startsWith("[answer:"))

    val pod = PipelineJobs.podcast(spark, s"$dir/index", "phillies",
      s"$dir/podcast", embedder, new StubLlm, new StubTts)
    assert(pod.count() == 1)
    val audio = spark.read.parquet(s"$dir/podcast")
      .select("audio").head.getAs[Array[Byte]](0)
    assert(audio.nonEmpty)
  }
}
