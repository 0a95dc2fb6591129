package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search (north-star scale path for L2):
  * random-hyperplane LSH — bucket = sign bits of the vector against
  * `numPlanes` seeded hyperplanes; a query probes its own bucket plus all
  * hamming-1 neighbors and brute-forces cosine within the candidates.
  *
  * At 100 TB the index is bucketed/partitioned by `bucket`, so a query reads
  * ~(numPlanes+1)/2^numPlanes of the data instead of all of it; recall is
  * tunable via numPlanes and the probe radius. Exact brute force
  * (SimilarityQueries.q40) remains the oracle baseline.
  */
object Similarity {

  /** Deterministic hyperplanes: seeded Gaussian components. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id of a vector (expression composition over a literal
    * plane matrix — stays declarative, no UDF). */
  def bucketExpr(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(emb, array(p.map(lit): _*), (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Index side: embeddings table + bucket column. */
  def bucketize(emb: DataFrame, embCol: String, planes: Array[Array[Double]]): DataFrame =
    emb.withColumn("bucket", bucketExpr(col(embCol), planes))

  private def bucketOf(v: Array[Float], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = v.zip(p).map { case (x, h) => x.toDouble * h }.sum
      if (dot >= 0) 1L << i else 0L
    }.reduce(_ | _)

  /** ANN top-k: probe the query bucket and its hamming-1 neighbors, exact
    * cosine within candidates. */
  def annTopK(index: DataFrame, embCol: String, idCol: String,
      query: Array[Float], k: Int, numPlanes: Int = 6, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(query.length, numPlanes, seed)
    val qb = bucketOf(query, planes)
    val probes = qb +: (0 until numPlanes).map(i => qb ^ (1L << i))
    val qv = array(query.map(lit): _*)
    bucketize(index, embCol, planes)
      .filter(col("bucket").isInCollection(probes))
      .select(col(idCol),
        VectorFunctions.cosineSim(col(embCol), qv).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  // ---- IVF (inverted-file) ANN: coarse k-means quantizer + probed lists ----
  //
  // The second scale path for L2: vectors are assigned to their
  // max-cosine centroid ("list"); a query scores the centroids on the driver
  // (nLists × dim doubles — trivially small) and scans only the nProbe best
  // lists. At 100 TB the assigned table is written partitioned by list_id, so
  // a probe is partition pruning, not a filter scan; nProbe == nLists
  // degenerates to exact brute force, which is the oracle configuration.

  /** Dot product of a vector column against a literal double vector
    * (centroids are unit-normalized, so argmax dot == argmax cosine). */
  private def dotLit(emb: Column, c: Array[Double]): Column =
    aggregate(
      zip_with(emb, array(c.map(lit): _*), (x, h) => x.cast("double") * h),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid id by max (dot, cid) — deterministic tiebreak.
    * greatest() unifies the struct types and renames fields col1/col2. */
  def nearestListExpr(emb: Column, cents: Array[Array[Double]]): Column =
    greatest(cents.zipWithIndex.map { case (c, i) =>
      struct(dotLit(emb, c), lit(i))
    }: _*).getField("col2")

  private def normalized(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Per-list mean vectors as ONE map-side-combinable aggregation returning
    * one row per non-empty list (≤ nLists rows — each carrying a dim-wide
    * vector, never nLists×dim scalar rows): ml's Summarizer keeps a running
    * (sum, count) vector per group and merges partials linearly. */
  def listMeans(index: DataFrame, embCol: String,
      cents: Array[Array[Double]]): DataFrame =
    index
      .select(nearestListExpr(col(embCol), cents).as("list_id"),
        org.apache.spark.ml.functions.array_to_vector(col(embCol)).as("v"))
      .groupBy(col("list_id"))
      .agg(org.apache.spark.ml.stat.Summarizer.mean(col("v")).as("m"))

  /** Spherical k-means coarse quantizer. Deterministic init: the nLists
    * vectors with the lowest ids. Centroids live on the driver (nLists×dim
    * doubles) like any broadcast dimension — the train loop is nIters
    * assign+average jobs over the index, never a collect of the data, and
    * each iteration collects exactly one mean-vector row per list. */
  def ivfCentroids(index: DataFrame, embCol: String, idCol: String,
      nLists: Int, nIters: Int = 2): Array[Array[Double]] = {
    // both collects below are bounded at nLists rows (the centroid matrix,
    // held driver-side by design like any broadcast dim) — cap nLists so a
    // caller can't turn them into a data-sized collect
    require(nLists > 0 && nLists <= 65536,
      s"nLists=$nLists out of range (driver holds nLists x dim doubles)")
    var cents: Array[Array[Double]] = index
      .orderBy(col(idCol)).limit(nLists)
      .select(col(embCol)).collect()
      .map(r => normalized(r.getSeq[Float](0).map(_.toDouble).toArray))
    for (_ <- 1 to nIters) {
      val means = listMeans(index, embCol, cents).collect()
      val next = Array.tabulate(cents.length)(i => cents(i).clone())
      means.foreach { r =>
        next(r.getInt(0)) = normalized(
          r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)
      }
      cents = next
    }
    cents
  }

  /** Index side: embeddings + assigned list id. In production this is a
    * build job whose output is partitioned by list_id (partition pruning at
    * probe time); here it composes inline for oracle-checkable queries. */
  def ivfAssign(index: DataFrame, embCol: String,
      cents: Array[Array[Double]]): DataFrame =
    index.withColumn("list_id", nearestListExpr(col(embCol), cents))

  /** Deployed-index form: persist the assigned table partitioned by
    * list_id, so probing reads only the probed lists' directories
    * (PartitionFilters at the scan — verified in IvfSpec). At 100 TB this
    * is the difference between scanning nProbe/nLists of the corpus and
    * scanning all of it. */
  def writeIvfIndex(index: DataFrame, embCol: String,
      cents: Array[Array[Double]], path: String): Unit = {
    val fs = fsOf(index.sparkSession, path)
    // data first, pin LAST: the upsert below REFUSES an index whose data
    // exists without a pin, so a crashed build fails fast on the next
    // upsert (rebuild required) instead of validating a pin that may not
    // describe the data — an upsert can't heal a partial build the way
    // the merge-branch indexes (Fts/DedupIndex) can
    ivfAssign(index, embCol, cents)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("list_id").parquet(path)
    PartitionedIndexOps.writePin(fs, pinPath(path),
      centroidsFingerprint(cents))
  }

  /** Incremental maintenance: vectors are immutable, so folding a new
    * batch in is APPEND-ONLY — assign against the pinned centroids and
    * append into the hit list partitions; no rewrite, no vacated buckets,
    * no crash window beyond parquet's own commit. Probes see the new
    * vectors immediately (same partition layout). An empty index routes to
    * the bulk build (which lays down the pin); data without a pin is a
    * crashed build and fails fast. */
  def upsertIvfIndex(newVecs: DataFrame, embCol: String,
      cents: Array[Array[Double]], path: String): Unit = {
    val spark = newVecs.sparkSession
    val fs = fsOf(spark, path)
    if (!PartitionedIndexOps.hasPartitions(fs, path, "list_id")) {
      writeIvfIndex(newVecs, embCol, cents, path)
      return
    }
    val stored = PartitionedIndexOps.readPin(fs, pinPath(path))
    require(stored.isDefined,
      s"IVF index at $path has data but no centroid pin (crashed build?) " +
        "— rebuild it with writeIvfIndex before upserting")
    require(stored.get == centroidsFingerprint(cents),
      s"IVF index at $path was built with different centroids — " +
        "an upsert under retrained centroids would mis-assign lists")
    ivfAssign(newVecs, embCol, cents)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("list_id").parquet(path)
  }

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def centroidsFingerprint(cents: Array[Array[Double]]): String =
    cents.map(_.map(v => java.lang.Long.toHexString(
      java.lang.Double.doubleToRawLongBits(v))).mkString(","))
      .mkString(";")

  private def pinPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "_meta/centroids")

  /** Probe a persisted IVF index: the list_id filter prunes partitions at
    * the file index, before any data is read. */
  def probeIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      embCol: String, idCol: String, query: Array[Float], k: Int,
      probes: Seq[Int]): DataFrame = {
    val qv = array(query.map(lit): _*)
    spark.read.parquet(path)
      .filter(col("list_id").isInCollection(probes))
      .select(col(idCol),
        round(graft.functions.CosineSimilarity(col(embCol), qv), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Rank centroids by dot with the query; take the best nProbe list ids. */
  def probeLists(query: Array[Float], cents: Array[Array[Double]],
      nProbe: Int): Seq[Int] = {
    val qd = query.map(_.toDouble)
    cents.zipWithIndex
      .map { case (c, i) => (c.zip(qd).map { case (a, b) => a * b }.sum, i) }
      .sortBy { case (s, i) => (-s, i) }
      .take(nProbe).map(_._2).toSeq
  }

  /** IVF top-k: probe the nProbe centroid lists nearest the query, exact
    * cosine within candidates. nProbe == cents.length ⇒ exact search. */
  def ivfTopK(index: DataFrame, embCol: String, idCol: String,
      query: Array[Float], k: Int, cents: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    val probes = probeLists(query, cents, nProbe)
    val qv = array(query.map(lit): _*)
    ivfAssign(index, embCol, cents)
      .filter(col("list_id").isInCollection(probes))
      .select(col(idCol),
        round(graft.functions.CosineSimilarity(col(embCol), qv), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
