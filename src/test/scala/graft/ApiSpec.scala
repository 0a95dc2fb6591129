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
}
