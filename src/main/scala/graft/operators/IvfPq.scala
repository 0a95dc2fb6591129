package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the FAISS `IndexIVFPQ` architecture re-expressed
  * as partitioned parquet + Catalyst expressions: the coarse quantizer
  * ([[Similarity]]'s spherical k-means lists) routes each vector to a
  * `list_id` partition, and what the partition STORES is the vector's
  * [[Pq]] code (m small ints, 8 B at m=8/k=16) instead of the raw
  * embedding (256 B at dim=64) — so a probe's candidate-generation scan
  * reads ~32× less data than the plain IVF index for the same list
  * pruning. Exact re-rank vectors live in a separate id-bucketed refine
  * table (`<path>_refine`, partitioned by `dbk = id mod nDocBuckets`),
  * which doubles as the id→list side table the re-crawl upsert needs
  * (the [[Fts]]/[[DedupIndex]] `_docs` pattern — an id's OLD list is not
  * recomputable from its new embedding).
  *
  * Probe = three bounded stages, each pruned at the file index:
  *   1. ADC candidate gen over the probed lists' code partitions
  *      (PartitionFilters on `list_id`; scoring is [[Pq.adcScoreExpr]] —
  *      m literal-table lookups inside whole-stage codegen, cut to
  *      `rerank` rows by TakeOrderedAndProject);
  *   2. a ≤`rerank`-row candidate-id collect (capped, PlanSpec-bounded);
  *   3. exact-cosine re-rank against a POINT-LOOKUP read of the refine
  *      table (PartitionFilters on `dbk` — the candidates' buckets only,
  *      never a full-table scan).
  * At 100 TB that is: read nProbe/nLists of an already-32×-compressed
  * code table, then fetch `rerank` vectors by key — the serving shape
  * memory-bounded ANN actually deploys (Jégou/Douze/Schmid, TPAMI 2011).
  * Reference analogue: the Chroma collection the reference serves ANN
  * from (scripts/scrape_store_embed.py) keeps a compressed in-memory
  * index; IVF-PQ is that index durable and partition-pruned.
  *
  * Crash ordering mirrors [[Similarity.writeIvfIndex]]: stale pin deleted
  * first, data, refine table, pin LAST — a crash leaves data-without-pin,
  * which upserts refuse fast. The pin covers everything that changes
  * routing or stored bytes: centroid bits, codebook bits, nDocBuckets.
  */
object IvfPq {

  /** Build the index: codes partitioned by assigned list, full vectors
    * id-bucketed for re-rank point lookups, config pinned last. */
  def writeIvfPqIndex(vecs: DataFrame, embCol: String, idCol: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      path: String, nDocBuckets: Int = 16): Unit = {
    val fs = fsOf(vecs.sparkSession, path)
    PartitionedIndexOps.requireUniqueIds(vecs, idCol)
    val claimed = PartitionedIndexOps.claimVersion(fs, versionPath(path))
    fs.delete(pinPath(path), false)
    val assigned = assign(vecs, embCol, idCol, cents, books, nDocBuckets)
      .cache()
    try {
      assigned.select(col(idCol), col("codes"), col("list_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("list_id").parquet(path)
      assigned.select(col(idCol), col("list_id"), col(embCol), col("dbk"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("dbk").parquet(refinePath(path))
    } finally assigned.unpersist()
    // the config pin is the build's commit: a losing concurrent builder
    // aborts here, leaving no valid pin (probes fail loudly)
    PartitionedIndexOps.requireVersion(fs, versionPath(path), claimed,
      s"IVF-PQ index bulk build at $path")
    PartitionedIndexOps.writeConfigPin(fs, pinPath(path),
      config(cents, books, nDocBuckets))
  }

  /** Fold a (re-)crawled batch in ([[Similarity.upsertIvfIndex]]'s merge
    * with a codes column): a re-crawled doc's changed embedding may have
    * moved lists AND always changes its stored code, so stale rows
    * anti-join away inside only the affected lists, and the refine
    * table's row is replaced in its (id-stable) bucket. Codes table first
    * (staged overwrite, then delete of vacated lists), refine second — a
    * crash between the two is healed by the foreachBatch retry of the
    * same batch, whose stale refine rows still name the true old lists.
    * Per-batch cost scales with the batch's list/bucket spread, never the
    * index size. */
  def upsertIvfPqIndex(newVecs: DataFrame, embCol: String, idCol: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      path: String, nDocBuckets: Int = 16): Unit = {
    val spark = newVecs.sparkSession
    val fs = fsOf(spark, path)
    if (!PartitionedIndexOps.hasPartitions(fs, path, "list_id")) {
      writeIvfPqIndex(newVecs, embCol, idCol, cents, books, path,
        nDocBuckets)
      return
    }
    val stored = PartitionedIndexOps.readConfigPin(fs, pinPath(path))
    require(stored.isDefined,
      s"IVF-PQ index at $path has data but no config pin (crashed build?)" +
        " — rebuild it with writeIvfPqIndex before upserting")
    require(stored.get == config(cents, books, nDocBuckets),
      s"IVF-PQ index at $path was built under different centroids, " +
        "codebooks, or doc-bucket geometry — an upsert would mis-assign " +
        "lists or store incomparable codes")
    PartitionedIndexOps.requireUniqueIds(newVecs, idCol)
    val claimed = PartitionedIndexOps.claimVersion(fs, versionPath(path))
    val assigned = assign(newVecs, embCol, idCol, cents, books, nDocBuckets)
      .cache()
    var prunedRef: Option[DataFrame] = None
    try {
      // ≤ nDocBuckets values by construction
      val dbkHit = assigned.select(col("dbk")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val batchIds = assigned.select(col(idCol)).distinct()
      val pruned = spark.read.parquet(refinePath(path))
        .filter(col("dbk").isInCollection(dbkHit)).cache()
      prunedRef = Some(pruned)
      val oldLists = pruned.join(batchIds, Seq(idCol), "left_semi")
        .select(col("list_id"))
      // ≤ nLists values by construction (cents.length ≤ 65536)
      val affected = assigned.select(col("list_id")).union(oldLists)
        .distinct().collect().map(_.get(0): Any).toSet
      val merged = spark.read.parquet(path)
        .filter(col("list_id").isInCollection(affected))
        .join(batchIds, Seq(idCol), "left_anti") // drop re-crawled docs
        .unionByName(assigned.select(col(idCol), col("codes"),
          col("list_id")))
      PartitionedIndexOps.overwriteAffected(merged, path, "list_id",
        affected, fs)
      // refine second (retry-healable); doc buckets never vacate (every
      // removed id is re-inserted into its id-stable bucket)
      val refMerged = pruned.join(batchIds, Seq(idCol), "left_anti")
        .unionByName(assigned.select(col(idCol), col("list_id"),
          col(embCol), col("dbk")))
      PartitionedIndexOps.requireVersion(fs, versionPath(path), claimed,
        s"IVF-PQ index upsert at $path")
      PartitionedIndexOps.pinWrite(refMerged, refinePath(path), "dbk")
    } finally {
      prunedRef.foreach(_.unpersist())
      assigned.unpersist()
    }
  }

  /** ADC candidate gen over the probed lists + exact re-rank via refine
    * point lookups. Output schema matches the exact rankers: (id, sim). */
  def probeIvfPqIndex(spark: SparkSession, path: String, embCol: String,
      idCol: String, query: Array[Float], k: Int, probes: Seq[Int],
      books: Array[Array[Array[Double]]], rerank: Int): DataFrame = {
    // the collect below is rerank-bounded; cap it so a caller can't turn
    // the point lookup into a data-sized collect
    require(rerank > 0 && rerank <= 1024,
      s"rerank=$rerank out of range (candidate ids are collected)")
    val fs = fsOf(spark, path)
    val stored = PartitionedIndexOps.readConfigPin(fs, pinPath(path))
    require(stored.isDefined,
      s"IVF-PQ index at $path has no config pin (never built, or a " +
        "crashed build) — build it with writeIvfPqIndex before probing")
    require(stored.get.get("codebooks").contains(booksFingerprint(books)),
      s"IVF-PQ index at $path was built under different codebooks — ADC " +
        "scores against these lookup tables would be meaningless")
    val qn = {
      val q = query.map(_.toDouble)
      val n = math.sqrt(q.map(x => x * x).sum)
      if (n == 0.0) q else q.map(_ / n)
    }
    val lut = Pq.adcLut(qn, books)
    // ≤ rerank (id, dbk) rows — the point-lookup key set
    val cand = adcCandidates(spark, path, idCol, probes, lut, rerank,
      storedDocBuckets(stored.get)).collect()
    val ids = cand.map(_.get(0): Any).toSeq
    val dbks = cand.map(_.getLong(1)).distinct.toSeq
    val qv = array(query.map(lit): _*)
    spark.read.parquet(refinePath(path))
      .filter(col("dbk").isInCollection(dbks) &&
        col(idCol).isInCollection(ids))
      .select(col(idCol),
        round(graft.functions.CosineSimilarity(col(embCol), qv), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** The ADC candidate-gen leg, factored out so the spec can assert its
    * `list_id` filter lands as a PARTITION filter (file-index pruning —
    * at scale this scan reads nProbe/nLists of an already-compressed
    * table, never all of it). */
  private[graft] def adcCandidates(spark: SparkSession, path: String,
      idCol: String, probes: Seq[Int], lut: Array[Array[Double]],
      rerank: Int, nDocBuckets: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("list_id").isInCollection(probes))
      .select(col(idCol), Pq.adcScoreExpr(col("codes"), lut).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol)).limit(rerank)
      .select(col(idCol),
        pmod(col(idCol), lit(nDocBuckets)).as("dbk"))

  /** A batch's full index row set: id, codes, assigned list, doc bucket.
    * Codes encode the NORMALIZED vector (ADC dots then approximate
    * cosine); the refine table keeps the raw embedding. The norm is
    * hoisted into its own column so it is computed once per row, not
    * once per codeword (Pq's codegen note). */
  private def assign(vecs: DataFrame, embCol: String, idCol: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      nDocBuckets: Int): DataFrame = {
    val dim = books.length * books(0)(0).length
    vecs.withColumn("__pqn", Pq.vecNorm(col(embCol), dim))
      .select(col(idCol), col(embCol),
        Similarity.nearestListExpr(col(embCol), cents).as("list_id"),
        Pq.encodeExpr(col(embCol), col("__pqn"), books).as("codes"),
        pmod(col(idCol), lit(nDocBuckets.toLong)).as("dbk"))
  }

  private def booksFingerprint(books: Array[Array[Array[Double]]]): String =
    books.map(PartitionedIndexOps.matrixFingerprint).mkString("|")

  private def config(cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      nDocBuckets: Int): Map[String, String] =
    Map("nDocBuckets" -> nDocBuckets.toString,
      "centroids" -> PartitionedIndexOps.matrixFingerprint(cents),
      "codebooks" -> booksFingerprint(books))

  private def storedDocBuckets(cfg: Map[String, String]): Long =
    cfg.getOrElse("nDocBuckets",
      sys.error("IVF-PQ pin is missing nDocBuckets")).toLong

  private def refinePath(path: String) = path + "_refine"

  // writer-version pin (concurrent-writer guard) — sibling _meta dir
  private def versionPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "_meta/version")

  private def pinPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "_meta/config")

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
