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
  *   path/bands     (doc_id, fp, band, bh)  partitioned by wb  = bh mod nBuckets
  *   path/shingles  (doc_id, sg)            partitioned by dbk = doc_id mod nDocBuckets
  *
  * `fp` is the doc's full-signature fingerprint
  * ([[Dedup.signatureFingerprint]], 8 B/row): it lets the capped probe
  * pre-collapse boilerplate clusters ([[probeIndexCapped]]) without
  * re-reading signatures; the uncapped probe column-prunes it away.
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
  // filename kept from the JSON-era pin: an index written by older code
  // still has ITS pin read (and fails loudly on the format mismatch via
  // requireConfigPin's missing-key check) instead of being silently
  // treated as unpinned
  private def configPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "/_meta/config.json")

  // writer-version pin (concurrent-writer guard); the root _meta dir is
  // never bulk-overwritten (only bands/ and shingles/ are), so it survives
  private def versionPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "/_meta/version")

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeConfig(spark: SparkSession, path: String,
      cfg: Map[String, Int]): Unit =
    PartitionedIndexOps.writeConfigPin(fsOf(spark, path), configPath(path),
      cfg.map { case (k, v) => k -> v.toString })

  private def requireConfig(spark: SparkSession, path: String,
      cfg: Map[String, Int]): Unit =
    PartitionedIndexOps.requireConfigPin(fsOf(spark, path), configPath(path),
      cfg.map { case (k, v) => k -> v.toString },
      s"dedup index at $path")

  // bandsFp: bands-table schema generation — 1 = rows carry the doc's
  // full-signature fingerprint (enables the hot-bucket-capped probe's
  // same-fingerprint pre-collapse). Pinned so a probe never meets an
  // index whose bands lack the column it collapses on: an index built by
  // pre-fingerprint code fails the pin loudly and is rebuilt.
  private def configOf(n: Int, numHashes: Int, rowsPerBand: Int,
      nBuckets: Int, nDocBuckets: Int): Map[String, Int] =
    Map("n" -> n, "numHashes" -> numHashes, "rowsPerBand" -> rowsPerBand,
      "nBuckets" -> nBuckets, "nDocBuckets" -> nDocBuckets,
      "bandsFp" -> 1)

  def writeSignatureIndex(docs: DataFrame, path: String, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      nBuckets: Int = 16, nDocBuckets: Int = 16): Unit = {
    val sg = Dedup.shingleSets(docs, n).cache()
    val fs = fsOf(docs.sparkSession, path)
    val claimed = PartitionedIndexOps.claimVersion(fs, versionPath(path))
    try {
      requireUniqueIds(sg)
      // CONFIG FIRST: a crash at any later point leaves the true build
      // parameters on disk, so a retry (or a differently-configured
      // caller) validates against reality instead of a vacuous pass that
      // would let mixed bucket geometries corrupt the index silently.
      // Then SHINGLES before BANDS: the upsert's "index exists" probe keys
      // on the bands table, so a crash mid-build leaves hasIndex=false and
      // the same-batch retry bulk-rebuilds cleanly — bands-first would
      // wedge every retry on a missing shingle read.
      writeConfig(docs.sparkSession, path,
        configOf(n, numHashes, rowsPerBand, nBuckets, nDocBuckets))
      sg.withColumn("dbk", bucketOf(col("doc_id"), nDocBuckets))
        .write.partitionBy("dbk").mode("overwrite")
        .parquet(path + "/shingles")
      // bands are the build's commit (hasIndex keys on them): a losing
      // concurrent builder aborts here and the retry bulk-rebuilds
      PartitionedIndexOps.requireVersion(fs, versionPath(path), claimed,
        s"dedup index bulk build at $path")
      // bands carry the signature fingerprint (8 B/row) so the capped
      // probe can pre-collapse boilerplate clusters without re-reading
      // signatures; the uncapped probe column-prunes it away
      Dedup.signatureBandsWithFp(Dedup.minhashSignatures(sg, numHashes),
          numHashes, rowsPerBand)
        .withColumn("wb", bucketOf(col("bh"), nBuckets))
        .write.partitionBy("wb").mode("overwrite").parquet(path + "/bands")
    } finally sg.unpersist()
  }

  /** An unordered frame with the same doc twice has no deterministic
    * winner — both the bulk build and the upsert fail loudly; callers
    * collapse re-crawls to one row per doc first. One aggregation job
    * (shared guard across the persisted indexes). */
  private def requireUniqueIds(sg: DataFrame): Unit =
    PartitionedIndexOps.requireUniqueIds(sg, "doc_id")

  /** Incremental maintenance — fold a (re-)crawled batch into the index
    * ([[Fts.upsertPostingsIndex]]'s ordering applied here; drive from
    * foreachBatch for a streaming feed). A re-crawled doc's OLD bands live
    * in buckets its new text doesn't reveal, but unlike the postings index
    * no extra side table is needed: the doc-bucketed SHINGLE table already
    * stores enough to recompute them. Per batch: old shingles come from a
    * doc-bucket-pruned read, affected = old ∪ new band buckets, stale rows
    * anti-join away inside only those buckets, and both tables rewrite only
    * touched partitions (dynamic overwrite, staged write FIRST, then an
    * explicit delete of buckets a re-crawl vacated — dynamic overwrite
    * never rewrites a partition with zero rows; a crash before the delete
    * is healed by the foreachBatch retry of the same batch). Shingle doc
    * buckets never empty (every removed id is re-inserted), so the side
    * write needs no delete pass. Per-batch cost scales with the batch's
    * band/doc spread, never the index size. */
  def upsertSignatureIndex(batch: DataFrame, path: String, n: Int = 3,
      numHashes: Int = 32, rowsPerBand: Int = 2,
      nBuckets: Int = 16, nDocBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    requireConfig(spark, path,
      configOf(n, numHashes, rowsPerBand, nBuckets, nDocBuckets))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bandsPath = path + "/bands"
    val shPath = path + "/shingles"
    if (!PartitionedIndexOps.hasPartitions(fs, bandsPath, "wb")) {
      // bulk branch — also heals a build that crashed mid-write, because
      // writeSignatureIndex lands bands LAST (see its ordering comment)
      writeSignatureIndex(batch, path, n, numHashes, rowsPerBand,
        nBuckets, nDocBuckets)
      return
    }
    val bsg = Dedup.shingleSets(batch, n).cache()
    try upsertCore(spark, path, bsg, n, numHashes, rowsPerBand,
      nBuckets, nDocBuckets, fs)
    finally bsg.unpersist()
  }

  /** The merge over a precomputed (cached) shingle frame — shared by
    * [[upsertSignatureIndex]] and [[ingestBatch]]. Caller owns bsg's
    * lifecycle; assumes the index exists (bulk routing happens above). */
  private def upsertCore(spark: SparkSession, path: String, bsg: DataFrame,
      n: Int, numHashes: Int, rowsPerBand: Int,
      nBuckets: Int, nDocBuckets: Int,
      fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val bandsPath = path + "/bands"
    val shPath = path + "/shingles"
    var prunedSh: Option[DataFrame] = None
    val claimed = PartitionedIndexOps.claimVersion(fs, versionPath(path))
    try {
      requireUniqueIds(bsg) // before any index read — reject cheaply
      // ≤ nDocBuckets values by construction
      val dbkHit = bsg.select(bucketOf(col("doc_id"), nDocBuckets).as("dbk"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val pruned = spark.read.parquet(shPath)
        .filter(col("dbk").isInCollection(dbkHit)).cache()
      prunedSh = Some(pruned)
      val newBands = Dedup.signatureBandsWithFp(
          Dedup.minhashSignatures(bsg, numHashes), numHashes, rowsPerBand)
        .withColumn("wb", bucketOf(col("bh"), nBuckets))
      val batchIds = bsg.select(col("doc_id")).distinct()
      // re-crawled docs' OLD bands recompute from the stored shingles; the
      // pruned buckets (the heavy side of the index) are read ONCE and
      // cached for both the old-band recompute and the rewrite below
      val oldSg = pruned
        .join(batchIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("sg"))
      val oldBands = Dedup.signatureBandsWithFp(
          Dedup.minhashSignatures(oldSg, numHashes), numHashes, rowsPerBand)
        .withColumn("wb", bucketOf(col("bh"), nBuckets))
      // ≤ nBuckets values by construction
      val affected = newBands.select(col("wb"))
        .union(oldBands.select(col("wb")))
        .distinct().collect().map(_.get(0): Any).toSet
      val merged = spark.read.parquet(bandsPath)
        .filter(col("wb").isInCollection(affected))
        .join(batchIds, Seq("doc_id"), "left_anti") // drop re-crawled docs
        .unionByName(newBands)
      PartitionedIndexOps.overwriteAffected(merged, bandsPath, "wb",
        affected, fs)
      val shMerged = pruned
        .join(batchIds, Seq("doc_id"), "left_anti")
        .unionByName(
          bsg.withColumn("dbk", bucketOf(col("doc_id"), nDocBuckets)))
      PartitionedIndexOps.requireVersion(fs, versionPath(path), claimed,
        s"dedup index upsert at $path")
      PartitionedIndexOps.pinWrite(shMerged, shPath, "dbk")
    } finally prunedSh.foreach(_.unpersist())
  }

  /** Near-dup pairs (jr, da=indexed doc, db=batch doc) for a fresh batch
    * against the persisted index. */
  def probeIndex(spark: SparkSession, path: String, batch: DataFrame,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5, nBuckets: Int = 16,
      nDocBuckets: Int = 16): DataFrame = {
    // DELIBERATE: the returned plan lazily reads the two probe-scoped
    // caches (bsg, cand), so a bare probe leaves them pinned — the lazy
    // plan is what lets callers inspect/compose the pruned-scan probe
    // (QueriesSpec asserts its PartitionFilters). A long-running ingest
    // LOOP must use ingestBatch, which owns both caches and releases them
    // after checkpointing; a long-lived SERVING session should use
    // probeIndexManaged, whose ProbeHandle releases them on close().
    probeIndexManaged(spark, path, batch, n, numHashes, rowsPerBand,
      threshold, nBuckets, nDocBuckets).result
  }

  /** [[probeIndex]] with cache ownership: the returned [[ProbeHandle]]
    * owns the two probe-scoped caches (batch shingles + verified
    * candidate pairs); materialize `result`, then `close()` and both are
    * released — the serving-session companion to [[ingestBatch]]'s
    * loop-owned lifecycle. */
  def probeIndexManaged(spark: SparkSession, path: String, batch: DataFrame,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5, nBuckets: Int = 16,
      nDocBuckets: Int = 16): ProbeHandle = {
    requireConfig(spark, path,
      configOf(n, numHashes, rowsPerBand, nBuckets, nDocBuckets))
    val bsg = Dedup.shingleSets(batch, n).cache()
    val (plan, cand) = probeCore(spark, path, bsg,
      numHashes, rowsPerBand, threshold, nBuckets, nDocBuckets)
    new ProbeHandle(plan, Seq(bsg, cand))
  }

  /** [[probeIndex]] with the hot-bucket population cap on the CORPUS side
    * of the band join — the persisted-index twin of
    * [[Dedup.incrementalDupPairsCapped]], and the probe shape a 100 TB
    * ingest pipeline should default to: without it, one boilerplate
    * bucket with 10 k stored copies fans every matching batch doc out to
    * all of them inside a single task. Output is identical to
    * [[probeIndex]] whenever no hit bucket exceeds `maxBucket` members
    * (the q177 oracle gate); on a hot bucket the batch doc's dup VERDICT
    * survives via the fingerprint representatives, only the redundant
    * partner enumeration is bounded (dropped-rep margin on stderr). */
  def probeIndexCapped(spark: SparkSession, path: String, batch: DataFrame,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5, nBuckets: Int = 16,
      nDocBuckets: Int = 16, maxBucket: Int = 64): DataFrame =
    probeIndexCappedManaged(spark, path, batch, n, numHashes, rowsPerBand,
      threshold, nBuckets, nDocBuckets, maxBucket).result

  /** [[probeIndexCapped]] with cache ownership ([[probeIndexManaged]]'s
    * contract). */
  def probeIndexCappedManaged(spark: SparkSession, path: String,
      batch: DataFrame, n: Int = 3, numHashes: Int = 32,
      rowsPerBand: Int = 2, threshold: Double = 0.5, nBuckets: Int = 16,
      nDocBuckets: Int = 16, maxBucket: Int = 64): ProbeHandle = {
    requireConfig(spark, path,
      configOf(n, numHashes, rowsPerBand, nBuckets, nDocBuckets))
    val bsg = Dedup.shingleSets(batch, n).cache()
    val (plan, cand) = probeCore(spark, path, bsg,
      numHashes, rowsPerBand, threshold, nBuckets, nDocBuckets,
      Some(maxBucket))
    new ProbeHandle(plan, Seq(bsg, cand))
  }

  /** The probe over a precomputed (cached) shingle frame — shared by
    * [[probeIndex]] and [[ingestBatch]] so the ingest loop pays the
    * shingle/signature pass once. Returns (pairs plan, pinned candidate
    * cache): the plan reads bsg and cand lazily, so the CALLER decides
    * when cand can be released — ingestBatch unpersists it right after
    * checkpointing the pairs; a bare probeIndex deliberately leaves it
    * pinned so the pruned-scan plan stays inspectable/composable. */
  private def probeCore(spark: SparkSession, path: String, bsg: DataFrame,
      numHashes: Int, rowsPerBand: Int, threshold: Double,
      nBuckets: Int, nDocBuckets: Int,
      maxBucket: Option[Int] = None): (DataFrame, DataFrame) = {
    val bb = Dedup.signatureBands(Dedup.minhashSignatures(bsg, numHashes),
        numHashes, rowsPerBand)
      .toDF("db", "band", "bh")
      .cache()
    // ≤ nBuckets values by construction
    val hit = bb.select(bucketOf(col("bh"), nBuckets).as("wb")).distinct()
      .collect().map(_.getLong(0))
    // wb = bh mod nBuckets, so every member of a hit (band, bh) bucket is
    // inside the pruned read — the capped branch's population counts see
    // the FULL bucket membership
    val cbAll = spark.read.parquet(path + "/bands")
      .filter(col("wb").isin(hit: _*))
    // capped branch's semi-filtered+counted frame, cached so the margin
    // action and the candidate materialization share ONE pruned read;
    // released below once cand is pinned
    var capCs: Option[DataFrame] = None
    val cb = maxBucket match {
      case None =>
        cbAll.select(col("doc_id").as("da"), col("band"), col("bh"))
      case Some(cap) =>
        // [[Dedup.incrementalDupPairsCapped]]'s corpus-side cap served
        // from the index: a batch doc landing in a boilerplate bucket is
        // bounded to the bucket's fingerprint representatives instead of
        // fanning out to every stored copy. Small buckets join exactly as
        // the uncapped path (output IDENTICAL when nothing is hot — the
        // q177 oracle gate); hot buckets collapse same-fp members to
        // their min-doc_id rep (identical shingle sets whp — a batch doc
        // matching a collapsed member matches its rep identically) and
        // keep the `cap` smallest reps, dropped-rep margin on stderr.
        import org.apache.spark.sql.expressions.Window
        // restrict to buckets the BATCH actually hits before any counting:
        // wb-pruning alone still reads every bucket sharing the hit wb
        // values (≈ the whole corpus for a spread batch), and the ×100
        // rehearsal measured the window count paying for all of it (7.2 M
        // hot members, capped probe 5.8 s vs uncapped 1.8 s). The batch's
        // (band, bh) key set is tiny (|batch| × bands rows), so a
        // broadcast semi-join drops non-hit buckets for free; counts stay
        // exact because every member of a hit bucket survives the semi,
        // and non-hit buckets could never produce candidates anyway.
        val hitKeys = broadcast(
          bb.select(col("band"), col("bh")).distinct())
        val base = cbAll.select(col("doc_id").as("da"), col("fp"),
          col("band"), col("bh"))
          .join(hitKeys, Seq("band", "bh"), "left_semi")
        // single-exchange bucket counts (see Dedup.lshCandidatesCapped):
        // the window partitioning also serves the fp collapse + rep rank
        val cs = base.withColumn("m",
          count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
          .cache()
        capCs = Some(cs)
        val small = cs.filter(col("m") <= cap)
          .select(col("da"), col("band"), col("bh"))
        val rk = cs.filter(col("m") > cap)
          .groupBy(col("band"), col("bh"), col("fp"))
          .agg(min(col("da")).as("da"), count(lit(1)).as("gm"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("band"), col("bh")).orderBy(col("da"))))
        // margin: collapse absorption + cap action (Dedup.lshCandidatesCapped)
        val m = rk.agg(
          countDistinct(col("band"), col("bh")).as("hotBuckets"),
          coalesce(sum(col("gm")), lit(0L)).as("hotMembers"),
          count(when(col("rk") > cap, 1)).as("droppedReps"),
          countDistinct(when(col("rk") > cap,
            struct(col("band"), col("bh")))).as("cappedBuckets")).head
        System.err.println(
          s"[lsh-cap-idx] hotBuckets=${m.getLong(0)} " +
            s"hotMembers=${m.getLong(1)} cappedBuckets=${m.getLong(3)} " +
            s"droppedReps=${m.getLong(2)}")
        small.union(
          rk.filter(col("rk") <= cap).select(col("da"), col("band"), col("bh")))
    }
    val cand = cb.join(bb.select(col("db"), col("band"), col("bh")),
        Seq("band", "bh"))
      .select(col("da"), col("db")).distinct().cache()
    // ≤ nDocBuckets values by construction
    val dHit = cand.select(bucketOf(col("da"), nDocBuckets).as("dbk"))
      .distinct().collect().map(_.getLong(0))
    // cand is fully materialized by the collect above; bb and the capped
    // branch's cs are dead now — release them so per-batch probes don't
    // accumulate pinned caches
    bb.unpersist()
    capCs.foreach(_.unpersist())
    val csg = spark.read.parquet(path + "/shingles")
      .filter(col("dbk").isin(dHit: _*))
      .select(col("doc_id").as("da"), col("sg").as("sga"))
    val j = TextFunctions.jaccard(col("sga"), col("sgb"))
    // da =!= db: inert for a fresh batch (ids disjoint from the index) but
    // keeps a foreachBatch RETRY — whose batch is already indexed — from
    // emitting self-pairs
    (cand.join(csg, "da")
      .join(bsg.select(col("doc_id").as("db"), col("sg").as("sgb")), "db")
      .filter(col("da") =!= col("db") && j >= threshold)
      .select(round(j, 4).as("jr"), col("da"), col("db")), cand)
  }

  /** The full ingest step a streaming crawl loop runs per batch: PROBE the
    * arriving docs against the index, then FOLD them in — one
    * shingle/signature pass serves both halves (probeIndex followed by
    * upsertSignatureIndex would pay it twice). Returns the verified pairs
    * against the PRE-upsert index, checkpointed before the upsert mutates
    * the partitions the probe plan reads. First batch on an empty index
    * bulk-builds and returns no pairs. The probe runs hot-bucket-CAPPED
    * (`maxBucket`, default 64): a long-running ingest is exactly where a
    * boilerplate cluster accumulates, and the capped probe bounds the
    * per-batch fan-out while preserving each batch doc's dup verdict
    * (identical output while no bucket is hot — the q145 oracle). */
  def ingestBatch(spark: SparkSession, path: String, batch: DataFrame,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.5, nBuckets: Int = 16,
      nDocBuckets: Int = 16, maxBucket: Int = 64): DataFrame = {
    requireConfig(spark, path,
      configOf(n, numHashes, rowsPerBand, nBuckets, nDocBuckets))
    val fs = fsOf(spark, path)
    if (!PartitionedIndexOps.hasPartitions(fs, path + "/bands", "wb")) {
      writeSignatureIndex(batch, path, n, numHashes, rowsPerBand,
        nBuckets, nDocBuckets)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("jr",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("da",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("db",
            org.apache.spark.sql.types.LongType))))
    }
    val bsg = Dedup.shingleSets(batch, n).cache()
    try {
      // the ingest loop is the 100 TB path — capped by default: a corpus
      // that has accumulated a boilerplate cluster must not quadratic-fan
      // every matching batch doc (q175's bound, served from the index)
      val (plan, cand) = probeCore(spark, path, bsg,
        numHashes, rowsPerBand, threshold, nBuckets, nDocBuckets,
        Some(maxBucket))
      val pairs = plan
        .localCheckpoint(true) // pin before the upsert rewrites the index
      // pairs is fully materialized — release the candidate cache so a
      // long-running foreachBatch ingest loop doesn't accumulate one
      // CacheManager entry per micro-batch
      cand.unpersist()
      upsertCore(spark, path, bsg, n, numHashes, rowsPerBand,
        nBuckets, nDocBuckets, fs)
      pairs
    } finally bsg.unpersist()
  }
}
