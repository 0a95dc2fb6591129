package graft

import graft.operators.{DedupIndex, LshIndex, PartitionedIndexOps, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-writer guard on the persisted indexes: every family's
  * upsert assumed ONE writer — two interleaved upserts could both pass
  * the config-pin check and interleave their staged-overwrite /
  * delete-vacated / side-table writes silently. The guard is a monotonic
  * writer-version pin: claim at entry (before any data write), re-check
  * immediately before the final commit write, abort on mismatch. These
  * specs drive the loser's exact schedule through the shared primitives
  * (a mid-call interleave can't be injected into a single-JVM API call
  * without production hooks) and then assert the REAL upserts integrate
  * the guard: each completed upsert advances the version by exactly one,
  * and a writer whose claim was overtaken fails fast with the index left
  * equal to the serial application of the winner.
  */
class ConcurrentWriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val e = Tables.embeddings(spark, TestSpark.sf0001).cache()
  private lazy val planes = Similarity.hyperplanes(64, 6)

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("claim/require primitives: monotonic claims, stale claim fails fast") {
    val v = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("wv").resolve("version").toString)
    assert(PartitionedIndexOps.readVersion(fs, v) == 0L)
    val a = PartitionedIndexOps.claimVersion(fs, v)
    assert(a.version == 1L)
    PartitionedIndexOps.requireVersion(fs, v, a, "writer A") // holds
    val b = PartitionedIndexOps.claimVersion(fs, v)
    assert(b.version == 2L)
    // A's final check after B claimed: must abort, and the message names
    // the conflict
    val ex = intercept[IllegalArgumentException] {
      PartitionedIndexOps.requireVersion(fs, v, a, "writer A")
    }
    assert(ex.getMessage.contains("concurrent writer"))
    PartitionedIndexOps.requireVersion(fs, v, b, "writer B") // winner holds
  }

  test("simultaneous claim of the same version: at most one writer validates") {
    // the hole a bare counter leaves open: A and B both read version v
    // before either publishes, both claim v+1, and a version-only check
    // passes BOTH. With the writer token, the pin can hold only one
    // writer's token at commit time — the overwritten claimer aborts,
    // and the abort message names the simultaneous claim.
    val v = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("wv2").resolve("version").toString)
    val a = PartitionedIndexOps.claimVersion(fs, v) // A publishes 1:tokA
    val b = PartitionedIndexOps.claimVersion(fs, v) // B overwrites: 2:tokB
    // simulate the same-version race directly: force the pin to B's token
    // under A's version number (as if both read 0 and both wrote 1)
    PartitionedIndexOps.writePin(fs, v, s"${a.version}:${b.token}")
    val ex = intercept[IllegalArgumentException] {
      PartitionedIndexOps.requireVersion(fs, v, a, "writer A")
    }
    assert(ex.getMessage.contains("simultaneous claim"))
    PartitionedIndexOps.requireVersion(fs, v,
      PartitionedIndexOps.VersionClaim(a.version, b.token), "writer B")
  }

  test("legacy bare-counter version pins never validate a tokened claim") {
    val v = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("wv3").resolve("version").toString)
    PartitionedIndexOps.writePin(fs, v, "7") // pre-token format
    assert(PartitionedIndexOps.readVersion(fs, v) == 7L)
    val c = PartitionedIndexOps.claimVersion(fs, v)
    assert(c.version == 8L)
    PartitionedIndexOps.requireVersion(fs, v, c, "writer") // own claim holds
  }

  test("dedup index: overtaken writer fails fast; index equals the winner's serial application") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_conc")
      .resolve("idx").toString
    val vPath = new org.apache.hadoop.fs.Path(dir + "/_meta/version")
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    DedupIndex.writeSignatureIndex(docs.filter(col("doc_id") % 5 < 3), dir)
    val v0 = PartitionedIndexOps.readVersion(fs, vPath)
    assert(v0 == 1L, "bulk build should have claimed version 1")
    // writer A enters (claims) but stalls before any write; writer B then
    // runs a complete real upsert
    val claimedA = PartitionedIndexOps.claimVersion(fs, vPath)
    DedupIndex.upsertSignatureIndex(docs.filter(col("doc_id") % 5 === 3), dir)
    assert(PartitionedIndexOps.readVersion(fs, vPath) == claimedA.version + 1,
      "a completed upsert must advance the version by exactly one")
    // A resumes at its commit point: the guard the upserts call must abort
    val ex = intercept[IllegalArgumentException] {
      PartitionedIndexOps.requireVersion(fs, vPath, claimedA,
        "dedup index upsert (writer A)")
    }
    assert(ex.getMessage.contains("concurrent writer"))
    // the index equals the serial winner-only application: probing it
    // matches a from-scratch build over the same final corpus
    val scratch = java.nio.file.Files.createTempDirectory("dedup_serial")
      .resolve("idx").toString
    DedupIndex.writeSignatureIndex(docs.filter(col("doc_id") % 5 < 4), scratch)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    def probe(p: String) = DedupIndex.probeIndex(spark, p, batch)
      .collect().map(_.toSeq).toSet
    assert(probe(dir) == probe(scratch))
    // and A's RETRY (the documented healing) converges to serial A-after-B
    DedupIndex.upsertSignatureIndex(docs.filter(col("doc_id") % 5 === 3), dir)
    assert(probe(dir) == probe(scratch))
  }

  test("LSH index: upsert and bulk build both advance the version; stale claim aborts") {
    val dir = java.nio.file.Files.createTempDirectory("lsh_conc")
      .resolve("idx").toString
    val vPath = new org.apache.hadoop.fs.Path(dir + "_meta/version")
    val evens = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"))
    LshIndex.writeLshIndex(evens, "embedding", "vec_id", planes, dir)
    assert(PartitionedIndexOps.readVersion(fs, vPath) == 1L)
    val claimedA = PartitionedIndexOps.claimVersion(fs, vPath)
    LshIndex.upsertLshIndex(
      e.filter(col("vec_id") % 2 === 1).select(col("vec_id"), col("embedding")),
      "embedding", "vec_id", planes, dir)
    assert(PartitionedIndexOps.readVersion(fs, vPath) == claimedA.version + 1)
    val ex = intercept[IllegalArgumentException] {
      PartitionedIndexOps.requireVersion(fs, vPath, claimedA,
        "LSH index upsert (writer A)")
    }
    assert(ex.getMessage.contains("concurrent writer"))
    // version survives (sibling _meta) and keeps advancing across a bulk
    // REBUILD that wipes the data dir
    LshIndex.writeLshIndex(evens, "embedding", "vec_id", planes, dir)
    assert(PartitionedIndexOps.readVersion(fs, vPath) == claimedA.version + 2)
  }
}
