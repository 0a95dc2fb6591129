package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash dedup index — [[Dedup.incrementalDupPairs]] with the
  * corpus side PRECOMPUTED and stored, the way a 100 TB ingest pipeline
  * actually runs dedup: corpus signatures are built once at index time and
  * every arriving batch probes them; nothing ever re-shingles the corpus
  * (the [[Fts]] persisted-index pattern applied to the dedup family).
  *
  * Layout:
  *   path/bands     (doc_id, band, bh)  partitioned by wb  = bh mod nBuckets
  *   path/shingles  (doc_id, sg)        partitioned by dbk = doc_id mod nDocBuckets
  *
  * A probe computes the batch's bands, reads ONLY the band buckets those hit
  * (partition pruning on wb, spec-asserted like the Fts/IVF indexes),
  * equi-joins candidates on (band, bh), then reads ONLY the candidate docs'
  * shingle buckets (pruning on dbk) for the exact-Jaccard verify. Both
  * driver-side bucket collects are bounded by construction (≤ nBuckets /
  * ≤ nDocBuckets values — PlanSpec whitelist). Probe output is identical to
  * [[Dedup.incrementalDupPairs]] on (corpus, batch): same bands, same
  * candidate set, same verify — the round-trip query q143 pins that under
  * the brute-force cross-split oracle.
  */
object DedupIndex {

  private def bucketOf(c: org.apache.spark.sql.Column, m: Int) =
    pmod(c, lit(m.toLong))

  def writeSignatureIndex(docs: DataFrame, path: String, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      nBuckets: Int = 16, nDocBuckets: Int = 16): Unit = {
    val sg = Dedup.shingleSets(docs, n).cache()
    Dedup.signatureBands(Dedup.minhashSignatures(sg, numHashes),
        numHashes, rowsPerBand)
      .withColumn("wb", bucketOf(col("bh"), nBuckets))
      .write.partitionBy("wb").mode("overwrite").parquet(path + "/bands")
    sg.withColumn("dbk", bucketOf(col("doc_id"), nDocBuckets))
      .write.partitionBy("dbk").mode("overwrite").parquet(path + "/shingles")
    sg.unpersist()
  }

  /** Near-dup pairs (jr, da=indexed doc, db=batch doc) for a fresh batch
    * against the persisted index. */
  def probeIndex(spark: SparkSession, path: String, batch: DataFrame,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5, nBuckets: Int = 16,
      nDocBuckets: Int = 16): DataFrame = {
    val bsg = Dedup.shingleSets(batch, n).cache()
    val bb = Dedup.signatureBands(Dedup.minhashSignatures(bsg, numHashes),
        numHashes, rowsPerBand)
      .toDF("db", "band", "bh")
      .cache()
    // ≤ nBuckets values by construction
    val hit = bb.select(bucketOf(col("bh"), nBuckets).as("wb")).distinct()
      .collect().map(_.getLong(0))
    val cb = spark.read.parquet(path + "/bands")
      .filter(col("wb").isin(hit: _*))
      .select(col("doc_id").as("da"), col("band"), col("bh"))
    val cand = cb.join(bb.select(col("db"), col("band"), col("bh")),
        Seq("band", "bh"))
      .select(col("da"), col("db")).distinct().cache()
    // ≤ nDocBuckets values by construction
    val dHit = cand.select(bucketOf(col("da"), nDocBuckets).as("dbk"))
      .distinct().collect().map(_.getLong(0))
    val csg = spark.read.parquet(path + "/shingles")
      .filter(col("dbk").isin(dHit: _*))
      .select(col("doc_id").as("da"), col("sg").as("sga"))
    val j = TextFunctions.jaccard(col("sga"), col("sgb"))
    cand.join(csg, "da")
      .join(bsg.select(col("doc_id").as("db"), col("sg").as("sgb")), "db")
      .filter(j >= threshold)
      .select(round(j, 4).as("jr"), col("da"), col("db"))
  }
}
