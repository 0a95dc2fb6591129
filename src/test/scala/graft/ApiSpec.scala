package graft

import graft.api.Graft
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Doc test for the README quickstart: the exact `graft.api.Graft` flow
  * the quickstart shows (ingest → dedup → index → retrieve → curate)
  * compiles and runs end-to-end on the sf0.001 corpus. Keep this in sync
  * with README.md's Quickstart section — it IS that code. */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("README quickstart runs end-to-end through the facade") {
    val sf = TestSpark.sf0001

    // 1. ingest: the lakehouse tables
    val docs = Graft.ingest.table(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val vecs = Graft.ingest.table(spark, sf, "embeddings")

    // 2. dedup: verified near-dup pairs → survivor groups
    val pairs = Graft.dedup.nearPairs(docs)
    val groups = Graft.dedup.groups(pairs.select(col("da"), col("db")))
    assert(pairs.count() > 0 && groups.count() > 0)

    // 3. index: a persisted LSH vector index
    val dir = java.nio.file.Files.createTempDirectory("qs").toString
    val planes = Graft.index.hyperplanes(dim = 64, numPlanes = 6)
    Graft.index.buildLsh(vecs, "embedding", "vec_id", planes, s"$dir/lsh")

    // 4. retrieve: top-10 neighbors of one vector through the index
    val q = vecs.filter(col("vec_id") === 5)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val top = Graft.retrieve.knnLsh(spark, s"$dir/lsh", "embedding",
      "vec_id", q, 10, planes)
    assert(top.count() > 0)

    // 5. curate: drop the non-survivor dup members, pack what remains
    val losers = pairs.select(col("db").as("doc_id")).distinct()
    val clean = docs.join(losers, Seq("doc_id"), "left_anti")
    val packed = Graft.curate.pack(clean, capacity = 256)
    assert(packed.select(max(col("pack"))).head.getLong(0) >= 0)
  }

  test("fts facade group: postings → boolean/phrase/bm25 + persisted round trip") {
    val sf = TestSpark.sf0001
    val docs = Graft.ingest.table(spark, sf, "documents")
    val postings = Graft.fts.postings(docs)
    val lens = Graft.fts.docLengths(docs)
    // the three query shapes over the in-memory postings
    val both = Graft.fts.and(postings, Seq("table", "join"))
    val adj = Graft.fts.phrase(postings, Seq("the", "table"))
    val ranked = Graft.fts.bm25(postings, lens, Seq("table", "join"))
    assert(both.count() >= 0 && adj.count() >= 0 && ranked.count() > 0)
    // persisted: build via the index group, fold an upsert batch through
    // the fts group, load pruned to the query terms
    val dir = java.nio.file.Files.createTempDirectory("fts_api").toString
    Graft.index.buildFts(docs.filter(col("doc_id") % 2 === 0), "doc_id",
      "text", s"$dir/fts")
    Graft.fts.upsertIndex(docs.filter(col("doc_id") % 2 === 1),
      s"$dir/fts")
    val loaded = Graft.fts.load(spark, s"$dir/fts", Seq("table", "join"))
    val served = Graft.fts.and(loaded, Seq("table", "join"))
    assert(served.collect().map(_.getLong(0)).sorted
      .sameElements(both.collect().map(_.getLong(0)).sorted),
      "index-served AND diverged from the in-memory postings")
  }

  test("stream facade group: watermarked dedup to parquet + checkpointed index-maintenance drain") {
    val sf = TestSpark.sf0001
    // stage the static events parquet as a stream source dir
    val srcDir = java.nio.file.Files.createTempDirectory("api_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      srcDir.resolve("events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("api_stream")
      .toString + "/out"
    Graft.stream.toParquet(
      Graft.stream.dedup(Graft.stream.events(spark, srcDir.toString)), out)
    val got = spark.read.parquet(out).count()
    val want = Tables.events(spark, sf).dropDuplicates("event_id").count()
    assert(got == want, s"streamed dedup $got rows vs batch $want")
    // the index-maintenance drain: two slices, a fold that counts batches
    val docs = Graft.ingest.table(spark, sf, "documents").limit(20)
    val seen = new java.util.concurrent.atomic.AtomicLong
    Graft.stream.ingest(spark,
      java.nio.file.Files.createTempDirectory("api_ingest"),
      Seq(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1)),
      batch => { seen.addAndGet(batch.count()): Unit })
    assert(seen.get() == 20, s"drain folded ${seen.get()} rows, want 20")
  }
}
