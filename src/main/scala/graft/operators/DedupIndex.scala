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

  /** Every parameter that changes band hashes or bucket ids is pinned on
    * disk and re-validated at probe time — a probe under a different config
    * would SILENTLY miss duplicates (wrong buckets pruned, wrong band
    * hashes joined), the same footgun the Fts index pins against. */
  private def writeConfig(spark: SparkSession, path: String,
      cfg: Map[String, Int]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "/_meta/config.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(cfg.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def requireConfig(spark: SparkSession, path: String,
      cfg: Map[String, Int]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "/_meta/config.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val stored = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      cfg.foreach { case (k, v) =>
        val got = ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(stored)
          .map(_.group(1).toInt)
        require(got.forall(_ == v),
          s"dedup index at $path was built with $k=${got.get}, " +
            s"probed with $k=$v — duplicates would be silently missed")
      }
    }
  }

  private def configOf(n: Int, numHashes: Int, rowsPerBand: Int,
      nBuckets: Int, nDocBuckets: Int): Map[String, Int] =
    Map("n" -> n, "numHashes" -> numHashes, "rowsPerBand" -> rowsPerBand,
      "nBuckets" -> nBuckets, "nDocBuckets" -> nDocBuckets)

  def writeSignatureIndex(docs: DataFrame, path: String, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      nBuckets: Int = 16, nDocBuckets: Int = 16): Unit = {
    val sg = Dedup.shingleSets(docs, n).cache()
    try {
      Dedup.signatureBands(Dedup.minhashSignatures(sg, numHashes),
          numHashes, rowsPerBand)
        .withColumn("wb", bucketOf(col("bh"), nBuckets))
        .write.partitionBy("wb").mode("overwrite").parquet(path + "/bands")
      sg.withColumn("dbk", bucketOf(col("doc_id"), nDocBuckets))
        .write.partitionBy("dbk").mode("overwrite")
        .parquet(path + "/shingles")
      writeConfig(docs.sparkSession, path,
        configOf(n, numHashes, rowsPerBand, nBuckets, nDocBuckets))
    } finally sg.unpersist()
  }

  /** Near-dup pairs (jr, da=indexed doc, db=batch doc) for a fresh batch
    * against the persisted index. */
  def probeIndex(spark: SparkSession, path: String, batch: DataFrame,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5, nBuckets: Int = 16,
      nDocBuckets: Int = 16): DataFrame = {
    requireConfig(spark, path,
      configOf(n, numHashes, rowsPerBand, nBuckets, nDocBuckets))
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
    // cand is fully materialized by the collect above; bb is dead now —
    // release it so per-batch probes don't accumulate pinned caches
    bb.unpersist()
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
