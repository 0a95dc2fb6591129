package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted random-hyperplane LSH index — the durable form of
  * [[Similarity.annTopK]]'s inline bucketing, completing the promise in
  * that scaladoc: vectors land in `bucket=` partitions (sign bits
  * against the pinned hyperplanes), so a probe reads its own bucket
  * plus the hamming-`radius` neighborhood as PARTITION PRUNING at the
  * file index — (numPlanes+1)/2^numPlanes of the data at radius 1 —
  * instead of re-bucketing the corpus per query. The third persisted
  * ANN family beside [[Similarity]]'s IVF and [[IvfPq]]; all three
  * share [[PartitionedIndexOps]]' pin format, staged partition
  * replacement, and compaction.
  *
  * Re-crawls: a changed embedding usually flips sign bits and MOVES
  * buckets, so the stale vector must leave its old bucket — the old
  * bucket is not recomputable from the new vector, hence the same
  * id-bucketed `_docs` side table as the siblings (Chroma's
  * delete-then-add upsert, scripts/scrape_store_embed.py:79-86).
  * Crash ordering identical to [[Similarity.writeIvfIndex]]: stale pin
  * deleted first, data, side table, pin LAST; upsert = staged dynamic
  * overwrite of affected buckets, then delete of vacated ones; a crash
  * between writes heals under the foreachBatch retry of the same batch.
  */
object LshIndex {

  /** Build: vectors partitioned by sign-bit bucket, id→bucket side
    * table partitioned by dbk, hyperplanes pinned last. `keepCols`
    * carries payload columns beyond (id, emb) into the index rows (e.g.
    * a label for contrastive mining) — pinned, so an upsert built with
    * different payload columns fails fast instead of writing a ragged
    * schema. */
  def writeLshIndex(vecs: DataFrame, embCol: String, idCol: String,
      planes: Array[Array[Double]], path: String,
      nDocBuckets: Int = 16, keepCols: Seq[String] = Nil): Unit = {
    val fs = fsOf(vecs.sparkSession, path)
    PartitionedIndexOps.requireUniqueIds(vecs, idCol)
    fs.delete(pinPath(path), false)
    val assigned = assign(vecs, embCol, idCol, planes, nDocBuckets,
      keepCols).cache()
    try {
      assigned.select((Seq(idCol, embCol) ++ keepCols).map(col) :+
          col("bucket"): _*)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("bucket").parquet(path)
      assigned.select(col(idCol), col("bucket"), col("dbk"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("dbk").parquet(path + "_docs")
    } finally assigned.unpersist()
    PartitionedIndexOps.writeConfigPin(fs, pinPath(path),
      config(planes, nDocBuckets, keepCols))
  }

  /** Fold a (re-)crawled batch in — the [[Similarity.upsertIvfIndex]]
    * merge with buckets for lists. Per batch: old buckets via a
    * dbk-pruned side-table read, affected = old ∪ new, stale rows
    * anti-join away inside only those buckets, staged overwrite then
    * delete-vacated, side table last. Cost ∝ batch spread. */
  def upsertLshIndex(newVecs: DataFrame, embCol: String, idCol: String,
      planes: Array[Array[Double]], path: String,
      nDocBuckets: Int = 16, keepCols: Seq[String] = Nil): Unit = {
    val spark = newVecs.sparkSession
    val fs = fsOf(spark, path)
    if (!PartitionedIndexOps.hasPartitions(fs, path, "bucket")) {
      writeLshIndex(newVecs, embCol, idCol, planes, path, nDocBuckets,
        keepCols)
      return
    }
    val stored = PartitionedIndexOps.readConfigPin(fs, pinPath(path))
    require(stored.isDefined,
      s"LSH index at $path has data but no config pin (crashed build?) " +
        "— rebuild it with writeLshIndex before upserting")
    require(stored.get == config(planes, nDocBuckets, keepCols),
      s"LSH index at $path was built under different hyperplanes, " +
        "doc-bucket geometry, or payload columns — an upsert would route " +
        "the wrong buckets or write a ragged schema")
    PartitionedIndexOps.requireUniqueIds(newVecs, idCol)
    val assigned = assign(newVecs, embCol, idCol, planes, nDocBuckets,
      keepCols).cache()
    var prunedDocs: Option[DataFrame] = None
    try {
      // ≤ nDocBuckets values by construction
      val dbkHit = assigned.select(col("dbk")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val batchIds = assigned.select(col(idCol)).distinct()
      val pruned = spark.read.parquet(path + "_docs")
        .filter(col("dbk").isInCollection(dbkHit)).cache()
      prunedDocs = Some(pruned)
      val oldBuckets = pruned.join(batchIds, Seq(idCol), "left_semi")
        .select(col("bucket"))
      // ≤ 2^numPlanes values by construction
      val affected = assigned.select(col("bucket")).union(oldBuckets)
        .distinct().collect().map(_.get(0): Any).toSet
      val merged = spark.read.parquet(path)
        .filter(col("bucket").isInCollection(affected))
        .join(batchIds, Seq(idCol), "left_anti") // drop re-crawled docs
        .unionByName(assigned.select(
          (Seq(idCol, embCol) ++ keepCols).map(col) :+ col("bucket"): _*))
      PartitionedIndexOps.overwriteAffected(merged, path, "bucket",
        affected, fs)
      // side table second (retry-healable); doc buckets never vacate
      val docsMerged = pruned.join(batchIds, Seq(idCol), "left_anti")
        .unionByName(assigned.select(col(idCol), col("bucket"), col("dbk")))
      PartitionedIndexOps.pinWrite(docsMerged, path + "_docs", "dbk")
    } finally {
      prunedDocs.foreach(_.unpersist())
      assigned.unpersist()
    }
  }

  /** Probe: exact cosine within the query's bucket and its
    * hamming-`radius` neighborhood — pruned at the file index. radius ≥
    * numPlanes probes every bucket (exact search, the oracle config). */
  def probeLshIndex(spark: SparkSession, path: String, embCol: String,
      idCol: String, query: Array[Float], k: Int,
      planes: Array[Array[Double]], radius: Int = 1): DataFrame = {
    val fs = fsOf(spark, path)
    val stored = PartitionedIndexOps.readConfigPin(fs, pinPath(path))
    require(stored.isDefined,
      s"LSH index at $path has no config pin (never built, or a crashed " +
        "build) — build it with writeLshIndex before probing")
    require(stored.get.get("planes")
        .contains(PartitionedIndexOps.matrixFingerprint(planes)),
      s"LSH index at $path was built under different hyperplanes — " +
        "probe buckets would not line up")
    val nb = planes.length
    // the probe-set enumeration is 2^numPlanes driver-side — cap it (an
    // LSH index with more planes than this has ~1-row buckets anyway)
    require(nb <= 20, s"numPlanes=$nb too large to enumerate probe sets")
    val qb = queryBucket(query, planes)
    val probes = (0L until (1L << nb))
      .filter(b => java.lang.Long.bitCount(b ^ qb) <= radius)
    val qv = array(query.map(lit): _*)
    spark.read.parquet(path)
      .filter(col("bucket").isInCollection(probes))
      .select(col(idCol),
        round(graft.functions.CosineSimilarity(col(embCol), qv), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Batch-serve index candidates for a WHOLE anchor frame — the pair-
    * mining / feature-lookup shape (each anchor needs its bucket plus the
    * hamming-`radius` neighborhood): one pruned index read + one
    * broadcast join, never a per-anchor probe loop. The anchors'
    * buckets are computed by the same pinned-plane expression the index
    * was built under; the union of probe buckets is a bounded driver
    * read (≤ 2^numPlanes values by construction — the [[probeLshIndex]]
    * enumeration bound) that lands as a PartitionFilter on the scan, and
    * the per-anchor bucket→anchor assignment rides the broadcast join.
    * radius ≥ numPlanes serves every bucket (exact candidates — the
    * oracle configuration); small radii trade recall for reading
    * ~Σ_r C(numPlanes, r)/2^numPlanes of the index per anchor.
    * Returns index rows joined with their requesting anchor's columns. */
  def batchProbe(spark: SparkSession, path: String, anchors: DataFrame,
      anchorEmbCol: String, planes: Array[Array[Double]],
      radius: Int = 1): DataFrame = {
    val fs = fsOf(spark, path)
    val stored = PartitionedIndexOps.readConfigPin(fs, pinPath(path))
    require(stored.isDefined,
      s"LSH index at $path has no config pin (never built, or a crashed " +
        "build) — build it with writeLshIndex before probing")
    require(stored.get.get("planes")
        .contains(PartitionedIndexOps.matrixFingerprint(planes)),
      s"LSH index at $path was built under different hyperplanes — " +
        "probe buckets would not line up")
    val nb = planes.length
    require(nb <= 20, s"numPlanes=$nb too large to enumerate probe sets")
    // masks stay VALUES (one exploded literal array, one XOR) — building
    // one expression child per mask would put 2^numPlanes Catalyst nodes
    // in a single projection at the full-radius oracle configuration
    val masks = (0L until (1L << nb))
      .filter(m => java.lang.Long.bitCount(m) <= radius)
    // cached: the frame is read twice (driver bucket-set collect + the
    // broadcast join side) and the two evaluations MUST agree — an anchor
    // pipeline that recomputes differently (sample/limit without a
    // defining order) would silently drop candidates whose buckets fell
    // outside the first collect. Deliberately left pinned, like
    // probeIndex's bare-probe caches ([[DedupIndex]]) — the returned
    // plan reads it lazily.
    val probes = anchors
      .withColumn("__b0", Similarity.bucketExpr(col(anchorEmbCol), planes))
      .withColumn("__m", explode(typedLit(masks)))
      .withColumn("bucket", col("__m").bitwiseXOR(col("__b0")))
      .drop("__b0", "__m")
      .cache()
    // ≤ 2^numPlanes values by construction (numPlanes <= 20)
    val hit = probes.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    spark.read.parquet(path)
      .filter(col("bucket").isInCollection(hit))
      .join(broadcast(probes), Seq("bucket"))
  }

  private def queryBucket(v: Array[Float],
      planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = v.zip(p).map { case (x, h) => x.toDouble * h }.sum
      if (dot >= 0) 1L << i else 0L
    }.reduce(_ | _)

  private def assign(vecs: DataFrame, embCol: String, idCol: String,
      planes: Array[Array[Double]], nDocBuckets: Int,
      keepCols: Seq[String] = Nil): DataFrame =
    vecs.select((Seq(idCol, embCol) ++ keepCols).map(col) ++ Seq(
      Similarity.bucketExpr(col(embCol), planes).as("bucket"),
      pmod(col(idCol), lit(nDocBuckets.toLong)).as("dbk")): _*)

  private def config(planes: Array[Array[Double]],
      nDocBuckets: Int, keepCols: Seq[String] = Nil): Map[String, String] =
    Map("nDocBuckets" -> nDocBuckets.toString,
      "planes" -> PartitionedIndexOps.matrixFingerprint(planes),
      "keepCols" -> keepCols.mkString(","))

  private def pinPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "_meta/config")

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
