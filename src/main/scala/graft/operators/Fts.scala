package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text-search query surface over the inverted postings index
  * (SURVEY §2.9 L13's query half — the reference's Chroma store maintains
  * FTS tables `embedding_fulltext_search*` in `scripts/vector_db/
  * chroma.sqlite3`; q46 builds the index, these operators QUERY it).
  *
  * The index is positional: one row per (term, doc) carrying tf and the
  * sorted in-doc positions. At 100 TB the postings table is written
  * bucketed by term, so a query's `word IN (...)` prunes to the queried
  * terms' buckets and every operator below touches only posting rows for
  * the query terms — never the corpus. All aggregations are keyed by
  * doc_id (map-side combinable; no global sort, no driver collect).
  */
object Fts {

  /** Build the positional postings index: doc text → one row per
    * (word, doc_id) with term frequency and sorted 0-based positions.
    * Tokenization matches [[graft.functions.TextFunctions.words]]
    * (single-space split) so index-backed scores equal text-scan scores.
    *
    * NO shuffle (r12): a document's text lives in ONE row, so the
    * per-(word, doc) groups are computable inside that row — the
    * [[graft.functions.WordPostings]] kernel emits the (word, tf,
    * positions) structs in one byte-level pass and this method just
    * explodes them. The previous `posexplode → groupBy(word, doc_id)`
    * form paid a full corpus exchange that merged nothing (every
    * (word, doc) group already sat complete in one map partition); at the
    * ×10 gate that exchange was the dominant stage of every inline FTS
    * query (q127/q128/q129). Row-set, schema, and shuffle-free-plan
    * equality with the composed form is pinned in FtsSpec ("native
    * per-doc postings kernel equals the composed posexplode+groupBy
    * build").
    *
    * PRECONDITION (now load-bearing, was silent): `docIdCol` is unique —
    * a corpus frame carries one row per document. The old groupBy would
    * have MERGED duplicate doc rows' positions (silently double-counting
    * tf, exactly what [[upsertPostingsIndex]]'s requireUniqueIds guard
    * exists to reject); the per-row kernel would instead emit duplicate
    * (word, doc) postings. Every caller passes a corpus keyed by doc id. */
  def positionalPostings(docs: DataFrame, docIdCol: String,
      textCol: String): DataFrame =
    docs.select(col(docIdCol).as("doc_id"),
        explode(graft.functions.WordPostings(col(textCol))).as("p"))
      .select(col("p.word").as("word"), col("doc_id"),
        col("p.tf").as("tf"), col("p.positions").as("positions"))

  /** Per-document token counts (the other half a lexical scorer needs —
    * index-resident, so scoring never re-reads text). */
  def docLengths(docs: DataFrame, docIdCol: String,
      textCol: String): DataFrame =
    docs.select(col(docIdCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("doc_len"))

  /** Conjunctive (AND) query: documents containing EVERY term, with the
    * summed term frequency as a match-strength score. Postings are unique
    * per (word, doc), so `count == n distinct terms` is the containment
    * test — one keyed aggregation over only the queried terms' postings. */
  def conjunctiveQuery(postings: DataFrame, terms: Seq[String]): DataFrame = {
    val distinctTerms = terms.distinct
    postings.filter(col("word").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("total_tf"))
      .filter(col("n_terms") === distinctTerms.size)
      .select(col("doc_id"), col("total_tf"))
  }

  /** Phrase query: documents where the words occur at consecutive
    * positions, with the occurrence count. Each phrase slot's positions
    * are shifted left by the slot index, so an occurrence is a position
    * present in EVERY slot's shifted set — computed per document as one
    * array_intersect fold over the (phrase-length-bounded) collected
    * arrays. Duplicate words in the phrase are handled by keying on slot,
    * not word. One broadcast join + one keyed aggregation. */
  def phraseQuery(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val spark = postings.sparkSession
    import spark.implicits._
    val slots = phrase.zipWithIndex.toDF("word", "slot")
    // the explicit isin pre-filter is REDUNDANT with the inner slots join
    // but load-bearing: a join cannot push its implied word restriction
    // through the postings AGGREGATION to the scan, a filter can — with
    // only the join, a phrase query over freshly-built postings aggregated
    // the WHOLE corpus first (×100 yardstick: 79 s vs 1.2 s DuckDB; the
    // conjunctive and BM25 paths always filtered, this path is now
    // aligned). Over a persisted index the same predicate is what prunes
    // term buckets at the file index.
    postings.filter(col("word").isin(phrase.distinct: _*))
      .join(broadcast(slots), "word")
      .select(col("doc_id"),
        transform(col("positions"), p => p - col("slot")).as("shifted"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_slots"),
        collect_list(col("shifted")).as("slot_positions"))
      .filter(col("n_slots") === phrase.length)
      .select(col("doc_id"),
        size(aggregate(
          slice(col("slot_positions"), 2, phrase.length - 1),
          element_at(col("slot_positions"), 1),
          (acc, a) => array_intersect(acc, a))).cast("long").as("n_matches"))
      .filter(col("n_matches") >= 1)
  }

  /** BM25 ranking over the postings index — the standard lexical relevance
    * function (Robertson/Sparck Jones; Lucene's idf form
    * ln((N - df + 0.5)/(df + 0.5) + 1)). Everything comes from the index:
    * df per term (≤ |terms| rows, broadcast), N and avgdl (one 1-row
    * broadcast aggregate), tf and doc_len per posting. The per-document
    * total adds the per-term partial scores in FIXED (sorted-term) order
    * via conditional aggregation, so the double sum is deterministic and
    * cross-engine reproducible. Touches only the queried terms' postings —
    * at 100 TB, term-bucket pruning makes query cost ∝ posting lists, not
    * corpus.
    *
    * The explicit doc_id repartition after the term filter (r12): with
    * the shuffle-free postings build there is no build exchange left in
    * the plan, so the df aggregate and the scoring branch — two consumers
    * of the hits — would each re-derive the corpus postings from scratch
    * (measured 1.9 s vs 1.2 at ×10). The repartition bounds that: the
    * scoring branch's copy lands partitioned by doc_id, which the
    * doc-length join and the final per-doc aggregate then reuse (no
    * further hits-sized exchange), and keying it on doc_id keeps it
    * parallel — a Window.partitionBy(word) df variant serialized the
    * hits onto ≤|terms| reducers (17.2 s vs 14.3 at corpus ×1000, where
    * the old build-exchange plan read 15.4). The two copies of the
    * exchange do not merge into one ReusedExchange: column pruning
    * narrows the df branch to [word, doc_id] (count(tf) gets rewritten
    * to count(1) — tf is non-nullable — so the tf column cannot be kept
    * referenced), which breaks canonical subtree equality; the df
    * branch's re-derivation is the measured residual and the recorded
    * next lever. */
  def bm25Scores(postings: DataFrame, docLens: DataFrame, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val ts = terms.distinct.sorted
    val hits = postings.filter(col("word").isin(ts: _*))
      .repartition(col("doc_id"))
    val dfT = hits.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // count/avg over integral doc_len are exact (long sum, then divide):
    // avgdl is deterministic, not a float-order accident
    val stats = docLens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("doc_len")).as("avgdl"))
    val scored = hits.join(broadcast(dfT), "word")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          (col("tf") * (k1 + 1)) /
          (col("tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("doc_len") / col("avgdl"))))
    val perTerm = ts.zipWithIndex.map { case (t, i) =>
      sum(when(col("word") === t, col("score"))).as(s"__s$i")
    }
    val total = ts.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduce(_ + _)
    scored.groupBy(col("doc_id"))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"), total.as("bm25"))
  }

  /** Deployed-index form (the IVF-index pattern, [[Similarity.writeIvfIndex]]):
    * persist the postings partitioned by a hash bucket of the term, so a
    * query's `word IN (...)` reads only its terms' bucket directories —
    * partition pruning at the file index, before any data is read. With B
    * buckets a Q-term query scans ≤ Q/B of the index regardless of corpus
    * size; bucket count trades directory fan-out against pruning ratio. */
  /** Bucket id of a column under the index's hash scheme (one definition —
    * the write and upsert paths must NEVER disagree on bucket assignment). */
  private def bucketCol(c: org.apache.spark.sql.Column, n: Int) =
    pmod(xxhash64(c), lit(n))

  /** The index pins its bucket config on disk: a caller passing a
    * different nBuckets than the index was BUILT with would otherwise
    * compute wrong bucket ids and silently prune to the wrong partitions
    * (missing postings, no error). Written at bulk build; checked by
    * every load/upsert. */
  // filename kept from the JSON-era pin — see DedupIndex.configPath
  private def cfgPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "_meta/config.json")

  // writer-version pin (concurrent-writer guard) — sibling _meta dir
  private def versionPath(path: String) =
    new org.apache.hadoop.fs.Path(path + "_meta/version")

  private def writeBucketConfig(fs: org.apache.hadoop.fs.FileSystem,
      path: String, nBuckets: Int, nDocBuckets: Int): Unit =
    PartitionedIndexOps.writeConfigPin(fs, cfgPath(path),
      Map("nBuckets" -> nBuckets.toString,
        "nDocBuckets" -> nDocBuckets.toString))

  // a mismatched nDocBuckets has the side-table version of the footgun:
  // it mis-prunes the doc-meta read and misses a re-crawl's old buckets
  private def requireBucketConfig(fs: org.apache.hadoop.fs.FileSystem,
      path: String, nBuckets: Int, nDocBuckets: Option[Int] = None): Unit =
    PartitionedIndexOps.requireConfigPin(fs, cfgPath(path),
      Map("nBuckets" -> nBuckets.toString) ++
        nDocBuckets.map(n => "nDocBuckets" -> n.toString),
      s"index at $path")

  /** The doc-bucketed side-table rows for a bucketed postings frame:
    * doc_id → sorted occupied term buckets, partitioned by doc bucket. */
  private def docMeta(bucketed: DataFrame, nDocBuckets: Int): DataFrame =
    bucketed.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("wb"))).as("wbs"))
      .withColumn("db", bucketCol(col("doc_id"), nDocBuckets))

  def writePostingsIndex(postings: DataFrame, path: String,
      nBuckets: Int = 64, nDocBuckets: Int = 64): Unit = {
    val bucketed = postings
      .withColumn("wb", bucketCol(col("word"), nBuckets))
      .persist() // written below AND aggregated into the side table
    try {
      // config FIRST: a crash at any later point leaves the true bucket
      // geometry on disk, so every retry or later caller validates against
      // reality (the merge branch never rewrites config — config-last left
      // a window where the pin was lost forever)
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        postings.sparkSession.sparkContext.hadoopConfiguration)
      val claimed = PartitionedIndexOps.claimVersion(fs, versionPath(path))
      writeBucketConfig(fs, path, nBuckets, nDocBuckets)
      bucketed.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("wb").parquet(path)
      // doc-bucketed side table (doc_id → occupied term buckets): what lets
      // an incremental upsert find a re-crawled doc's OLD buckets without
      // scanning the index (see upsertPostingsIndex)
      PartitionedIndexOps.requireVersion(fs, versionPath(path), claimed,
        s"postings index bulk build at $path")
      docMeta(bucketed, nDocBuckets)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("db").parquet(path + "_docs")
    } finally bucketed.unpersist()
  }

  /** Incremental index maintenance — fold a (re-)crawled document batch
    * into a persisted postings index (the [[Lakehouse.scd2MergeIntoBuckets]]
    * pattern applied to postings). The subtlety term-partitioning creates:
    * a re-crawled doc's OLD postings live in the buckets of its OLD terms,
    * which the new text doesn't reveal — so the index keeps a doc-bucketed
    * side table (`<path>_docs`: doc_id → the wb buckets its postings
    * occupy). Per batch: old buckets come from a doc-bucket-pruned side
    * read, affected = old ∪ new term buckets, stale rows anti-join away
    * inside only those buckets, and both tables rewrite only touched
    * partitions (dynamic overwrite). Per-batch cost scales with the
    * batch's term/doc spread, never the index size. Drive it from
    * `foreachBatch` for a streaming crawl feed. */
  def upsertPostingsIndex(newDocs: DataFrame, path: String, docIdCol: String,
      textCol: String, nBuckets: Int = 64, nDocBuckets: Int = 64): Unit = {
    val spark = newDocs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireBucketConfig(fs, path, nBuckets, Some(nDocBuckets))
    // a batch carrying the same doc twice would silently merge the copies'
    // positions and double tf — same guard as the sibling indexes
    PartitionedIndexOps.requireUniqueIds(newDocs, docIdCol)
    val claimed = PartitionedIndexOps.claimVersion(fs, versionPath(path))
    val batch = positionalPostings(newDocs, docIdCol, textCol)
      .withColumn("wb", bucketCol(col("word"), nBuckets))
    val batchIds = batch.select(col("doc_id")).distinct()
    val batchMeta = docMeta(batch, nDocBuckets)
    val docsPath = path + "_docs"
    batch.persist() // reused by ids/meta/affected/merged below — built once
    try {
      if (PartitionedIndexOps.hasPartitions(fs, path, "wb")) {
        // both collects are bucket-id sets, ≤ nDocBuckets / ≤ nBuckets values
        val dbs = batchMeta.select(col("db")).distinct()
          .collect().map(_.get(0)).toSeq
        // recovery path: a bulk build that died between its two writes
        // leaves the index without its side table — rebuild the needed
        // meta from the index itself (one full scan, only ever paid once)
        val docsExists = fs.exists(new org.apache.hadoop.fs.Path(docsPath))
        val oldMeta =
          (if (docsExists)
            spark.read.parquet(docsPath).filter(col("db").isInCollection(dbs))
          else docMeta(spark.read.parquet(path), nDocBuckets))
            .join(batchIds, Seq("doc_id"), "left_semi")
        val affected = oldMeta.select(explode(col("wbs")).as("wb"))
          .union(batch.select(col("wb"))).distinct()
          .collect().map(_.get(0)).toSeq
        val merged = spark.read.parquet(path)
          .filter(col("wb").isInCollection(affected))
          .join(batchIds, Seq("doc_id"), "left_anti") // drop re-crawled docs
          .unionByName(batch)
        // staged-overwrite-then-delete-vacated ordering — shared with the
        // dedup signature index; rationale on PartitionedIndexOps
        PartitionedIndexOps.overwriteAffected(merged, path, "wb",
          affected.toSet, fs)
        // crash seam (production no-op): the window between the index
        // write above and the side-table write below is the one the
        // retry-heals contract covers — FtsCrashRecoverySpec SIGKILLs a
        // real driver JVM parked here and asserts heal-to-scratch
        graft.streaming.CrashPoints.reached("fts.upsert.between-writes")
        // the side table second: if a failure lands between the two writes,
        // re-running the SAME batch (foreachBatch retry semantics) still
        // heals — old meta lists the doc's previous buckets, the retry's
        // affected set covers previous ∪ current, and the doc-keyed
        // anti-join + union is idempotent. Doc buckets can never empty
        // (every removed id is re-inserted), so no delete pass is needed.
        // In the recovery case the main index was just rewritten, so the
        // whole side table re-derives from it directly.
        val docsMerged =
          if (docsExists)
            spark.read.parquet(docsPath)
              .filter(col("db").isInCollection(dbs))
              .join(batchIds, Seq("doc_id"), "left_anti")
              .unionByName(batchMeta)
          else docMeta(spark.read.parquet(path), nDocBuckets)
        PartitionedIndexOps.requireVersion(fs, versionPath(path), claimed,
          s"postings index upsert at $path")
        PartitionedIndexOps.pinWrite(docsMerged, docsPath, "db")
      } else {
        // config first — same crash-consistency rationale as
        // writePostingsIndex
        writeBucketConfig(fs, path, nBuckets, nDocBuckets)
        batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("wb").parquet(path)
        PartitionedIndexOps.requireVersion(fs, versionPath(path), claimed,
          s"postings index bulk branch at $path")
        batchMeta.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("db").parquet(docsPath)
      }
    } finally batch.unpersist()
  }

  /** Read back only the buckets the query terms hash into. The returned
    * frame still carries every posting in those buckets; the word filter
    * itself is pushed to the scan as a data filter on top of the partition
    * prune, so every Fts query operator composes unchanged. */
  def loadPostings(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], nBuckets: Int = 64): DataFrame = {
    requireBucketConfig(new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration), path, nBuckets)
    // bucket ids computed driver-side with the SAME hash the write used
    // (functions.xxhash64 == XxHash64 expression, seed 42) — no job, no
    // collect, just Q literal evaluations
    val buckets = terms.distinct.map { t =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType)), 42L)
        .eval(null).asInstanceOf[Long]
      ((h % nBuckets) + nBuckets) % nBuckets
    }.distinct
    spark.read.parquet(path)
      .filter(col("wb").isInCollection(buckets))
      .drop("wb")
  }

  /** Index-backed lexical score: sum of the query terms' tf over the doc
    * length — exactly `|tokens ∈ terms| / |tokens|`, but computed from the
    * postings + doc-length tables instead of re-scanning text (the 100 TB
    * shape: the corpus is tokenized once at index-build; queries read only
    * the matching postings). Docs with no hits keep score 0 via the
    * left join. */
  def lexicalScores(postings: DataFrame, docLens: DataFrame,
      terms: Seq[String]): DataFrame = {
    val hits = postings.filter(col("word").isin(terms.distinct: _*))
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("hit_tf"))
    docLens.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("hit_tf"), lit(0L)).cast("double") /
          col("doc_len")).as("lex"))
  }
}
