package graft

import graft.operators.{BloomJoin, Lakehouse}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the lakehouse operators (q104/q107/q108); exact value
  * correctness is the DuckDB oracle gate. */
class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bloom join: bit-identical to the plain join") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val dim = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val pre = BloomJoin.prefilteredJoin(li, dim, "l_orderkey")
      .collect().map(_.toSeq).toSet
    val plain = li.join(dim, Seq("l_orderkey")).collect().map(_.toSeq).toSet
    assert(pre == plain && pre.nonEmpty)
  }

  test("bloom join: the prefilter prunes the fact side before the join") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val dim = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val bloom = BloomJoin.buildFilter(dim, "l_orderkey", expectedItems = -1,
      fpp = 0.01, maxFilterBytes = BloomJoin.DefaultMaxFilterBytes).get
    val total = li.count()
    val passed = li.filter(
      graft.functions.BloomContainsLong(col("l_orderkey"), bloom)).count()
    val exact = li.join(dim, Seq("l_orderkey")).count()
    // no false negatives: everything that joins passes the filter;
    // real pruning: far fewer than all rows pass (urgent ≈ 1/5 of orders)
    assert(passed >= exact)
    assert(passed < total / 2, s"bloom passed $passed of $total — no pruning?")
  }

  test("bloom join: filter is sized from the dim count (saturation regression)") {
    // r11 defect: a filter hardcoded below the dim's key count saturates
    // (fpp → 1) and prunes nothing. Auto-sizing must allocate at least the
    // optimal bits for the dim's true cardinality.
    val dim = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey").as("l_orderkey"))
    val n = dim.count()
    val bloom = BloomJoin.buildFilter(dim, "l_orderkey", expectedItems = -1,
      fpp = 0.01, maxFilterBytes = BloomJoin.DefaultMaxFilterBytes).get
    val optimal = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, 0.01)
    assert(bloom.bitSize() >= optimal,
      s"filter ${bloom.bitSize()} bits < optimal $optimal for $n keys")
    // and it actually holds the fpp contract on this dim: a disjoint probe
    // set should almost never hit
    val misses = (1L to 1000L).map(k => -k).count(bloom.mightContainLong)
    assert(misses <= 50, s"$misses/1000 false positives — saturated filter")
  }

  test("bloom join: sizing survives the runtime-filter conf clamps (r12 regression)") {
    // Spark 4's stat.bloomFilter clamps via runtime.bloomFilter.maxNumBits
    // (2^26) and maxNumItems (4M). A dim above BOTH clamps must still get
    // an optimally-sized, non-overfull filter — at x1000 the clamped
    // filter read fpp 0.76-0.95 and pruned nothing. buildFilter lifts the
    // confs for the build and REQUIREs the result un-clamped; this pins
    // that on a 6M-key dim (above the 4M item clamp; optimal bits 2.1x
    // the bits clamp).
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val confBefore = spark.conf.getOption(bitsKey)
    val dim = spark.range(0, 6L * 1000 * 1000).select(col("id").as("k"))
    val bloom = BloomJoin.buildFilter(dim, "k", expectedItems = -1,
      fpp = 0.01, maxFilterBytes = BloomJoin.DefaultMaxFilterBytes).get
    val optimal = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(6L * 1000 * 1000, 0.01)
    assert(bloom.bitSize() >= optimal,
      s"bits clamp returned: ${bloom.bitSize()} < $optimal")
    assert(bloom.expectedFpp() <= 0.04,
      s"item clamp returned: filter overfull at fpp ${bloom.expectedFpp()}")
    // and the conf restore happened (getOption surfaces the session
    // DEFAULT when unset, so compare against the before-state, not None)
    assert(spark.conf.getOption(bitsKey) == confBefore)
  }

  test("bloom join: over-budget filter degrades to the plain join") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val dim = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    assert(BloomJoin.buildFilter(dim, "l_orderkey", -1, 0.01,
      maxFilterBytes = 16).isEmpty)
    val joined = BloomJoin.prefilteredJoin(li, dim, "l_orderkey",
      maxFilterBytes = 16).collect().map(_.toSeq).toSet
    val plain = li.join(dim, Seq("l_orderkey")).collect().map(_.toSeq).toSet
    assert(joined == plain && joined.nonEmpty)
  }

  test("bloom probe: native expression, codegen'd, null-safe") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1024, 0.01)
    (1L to 100L).foreach(bloom.putLong)
    // range (not a local Seq) so ConvertToLocalRelation can't fold the
    // filter away on the driver — we want the executed plan
    val df = spark.range(1, 2001).select(
      when(col("id") % 1000 === 0, lit(null)).otherwise(col("id")).as("k"))
    val probed = df.filter(graft.functions.BloomContainsLong(col("k"), bloom))
    val kept = probed.collect().map(_.getLong(0)).toSet
    assert((1L to 100L).toSet.subsetOf(kept), "false negatives are impossible")
    val fps = kept.count(_ > 100L)
    assert(fps < 60, s"$fps false positives in 1900 probes at fpp=0.01")
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains_long"), plan)
    // the * prefix marks the Filter as inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter bloom_contains_long") && l.contains("*(")), plan)
    assert(!plan.toLowerCase.contains("scalaudf"),
      s"probe fell out of codegen:\n$plan")
  }

  test("scd2: versions contiguous, intervals chain, exactly one current per key") {
    val dim = Lakehouse.scd2(Tables.orders(spark, TestSpark.sf0001),
      key = "o_custkey", orderCol = "o_orderdate", tiebreak = "o_orderkey")
    val byKey = dim.select("o_custkey", "version", "valid_from", "valid_to")
      .collect().groupBy(_.getLong(0))
    assert(byKey.nonEmpty)
    byKey.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rows.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // interval chain: this version closes when the next opens
          assert(a.get(3) == b.get(2))
        case _ =>
      }
      assert(sorted.last.isNullAt(3)) // open-ended current version
    }
    val currents = dim.filter(col("is_current")).groupBy("o_custkey")
      .count().filter(col("count") =!= 1).count()
    assert(currents == 0)
  }

  test("scd2Merge: incremental fold equals the one-shot recompute") {
    val ord = Tables.orders(spark, TestSpark.sf0001)
    val cols = ord.columns.toSeq ++ Seq("version", "valid_from", "valid_to", "is_current")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val full = Lakehouse.scd2(ord, "o_custkey", "o_orderdate", "o_orderkey")
    val merged = Lakehouse.scd2Merge(
      Lakehouse.scd2(ord.filter(col("o_orderkey") % 2 === 0),
        "o_custkey", "o_orderdate", "o_orderkey"),
      ord.filter(col("o_orderkey") % 2 === 1),
      "o_custkey", "o_orderdate", "o_orderkey")
    assert(canon(merged) == canon(full))
  }

  test("scd2MergeIntoBuckets: a narrow batch rewrites only its buckets") {
    val ord = Tables.orders(spark, TestSpark.sf0001)
    val base = java.nio.file.Files.createTempDirectory("scd2_buckets")
    val dimPath = base.resolve("dim").toString
    // seed the dimension with most customers, then a batch touching ONE key
    Lakehouse.scd2MergeIntoBuckets(ord.filter(col("o_custkey") =!= 7),
      dimPath, "o_custkey", "o_orderdate", "o_orderkey")
    def filesByBucket: Map[String, Set[String]] = {
      val root = new java.io.File(dimPath)
      root.listFiles().filter(_.getName.startsWith("kb=")).map { d =>
        d.getName -> d.listFiles().map(_.getName).toSet
      }.toMap
    }
    val before = filesByBucket
    Lakehouse.scd2MergeIntoBuckets(ord.filter(col("o_custkey") === 7),
      dimPath, "o_custkey", "o_orderdate", "o_orderkey")
    val after = filesByBucket
    // only bucket kb = 7 mod 16 gained new part files
    assert(before.keySet.subsetOf(after.keySet))
    before.keySet.foreach { kb =>
      if (kb == "kb=7") assert(before(kb) != after(kb), "touched bucket unchanged")
      else assert(before(kb) == after(kb), s"untouched bucket $kb rewritten")
    }
    // and the merged dimension equals the one-shot recompute
    val cols = ord.columns.toSeq ++ Seq("version", "valid_from", "valid_to", "is_current")
    val got = spark.read.parquet(dimPath)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val want = Lakehouse.scd2(ord, "o_custkey", "o_orderdate", "o_orderkey")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("scd2MergeIntoBuckets: replaying a batch is idempotent (ST5 for CDC)") {
    val ord = Tables.orders(spark, TestSpark.sf0001)
    val base = java.nio.file.Files.createTempDirectory("scd2_replay")
    val dimPath = base.resolve("dim").toString
    val batch1 = ord.filter(col("o_orderkey") % 2 === 0)
    val batch2 = ord.filter(col("o_orderkey") % 2 === 1)
    Lakehouse.scd2MergeIntoBuckets(batch1, dimPath, "o_custkey", "o_orderdate", "o_orderkey")
    Lakehouse.scd2MergeIntoBuckets(batch2, dimPath, "o_custkey", "o_orderdate", "o_orderkey")
    def snapshot = spark.read.parquet(dimPath)
      .select((ord.columns.toSeq ++ Seq("version", "valid_from", "valid_to", "is_current"))
        .map(col): _*).collect().map(_.toSeq).toSet
    val once = snapshot
    // a Spark retry / restarted stream re-delivers the last batch
    Lakehouse.scd2MergeIntoBuckets(batch2, dimPath, "o_custkey", "o_orderdate", "o_orderkey")
    assert(snapshot == once, "replayed batch changed the dimension")
  }

  test("scd2Merge: divergent re-delivery resolves deterministically — batch wins") {
    import spark.implicits._
    val changes = Seq((1L, "2024-01-01", 101L, 10.0), (1L, "2024-02-01", 102L, 11.0))
      .toDF("k", "d", "id", "price")
    val existing = Lakehouse.scd2(changes, "k", "d", "id")
    // a retry re-delivers change id=102 with a corrected payload
    val redelivered = Seq((1L, "2024-02-01", 102L, 99.0)).toDF("k", "d", "id", "price")
    val merged = Lakehouse.scd2Merge(existing, redelivered, "k", "d", "id")
      .select("k", "id", "price", "version").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // same chain length, the corrected payload survives, versions intact
    assert(merged == Set((101L, 10.0, 1), (102L, 99.0, 2)))
  }

  test("count-min sketch is linear: per-lang merge equals the global build") {
    import org.apache.spark.util.sketch.CountMinSketch
    val toks = Tables.documents(spark, TestSpark.sf0001)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
    def fromBytes(b: Array[Byte]) =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    val agg = "count_min_sketch(w, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"
    val global = fromBytes(toks.selectExpr(s"$agg AS sk").head.getAs[Array[Byte]]("sk"))
    val merged = toks.groupBy("lang").agg(expr(agg).as("sk")).collect()
      .map(r => fromBytes(r.getAs[Array[Byte]]("sk")))
      .reduceLeft { (a, b) => a.mergeInPlace(b); a }
    assert(merged.totalCount() == global.totalCount())
    // identical estimates for the whole vocabulary
    val vocab = toks.select("w").distinct().collect().map(_.getString(0))
    vocab.foreach { w =>
      assert(merged.estimateCount(w) == global.estimateCount(w))
    }
    // and exactness on this corpus-sized vocabulary: estimate == true count
    val exact = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    vocab.foreach(w => assert(merged.estimateCount(w) >= exact(w)))
  }

  test("bloomIndexedWrite: footers carry a bloom filter for the indexed column") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("bloom_idx")
    val path = base.resolve("t").toString
    Lakehouse.bloomIndexedWrite(
      Tables.documents(spark, TestSpark.sf0001).coalesce(1),
      path, bloomCols = Seq("doc_id"), ndv = 10000L)
    val part = new java.io.File(path).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getAbsolutePath),
      spark.sparkContext.hadoopConfiguration))
    try {
      val cols = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
      val idCol = cols.find(_.getPath.toDotString == "doc_id").get
      assert(idCol.getBloomFilterOffset >= 0, "no bloom filter for doc_id")
      val textCol = cols.find(_.getPath.toDotString == "text").get
      assert(textCol.getBloomFilterOffset < 0, "unindexed column got a bloom")
    } finally reader.close()
    // the indexed file still round-trips
    assert(spark.read.parquet(path).count() ==
      Tables.documents(spark, TestSpark.sf0001).count())
  }

  test("lake schema evolution: mergeSchema unions batch schemas, old rows null-filled") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val base = java.nio.file.Files.createTempDirectory("evolve")
    val path = base.resolve("t").toString
    docs.select("doc_id", "text").write.parquet(path)
    docs.select(col("doc_id") + 100000, col("text"),
        (col("n_chars") / 100.0).as("quality"))
      .toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(path)
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality"))
    assert(merged.count() == 2 * docs.count())
    // rows from the pre-evolution batch surface with a NULL quality
    assert(merged.filter(col("quality").isNull).count() == docs.count())
    assert(merged.filter(col("quality").isNotNull).count() == docs.count())
  }

  test("zValue: matches a reference bit-interleave on a grid") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
      Lakehouse.zValue(col("x"), col("y"), bits = 5).cast("long").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") == ref(r.getAs[Long]("x"), r.getAs[Long]("y"), 5))
    }
    // the interleave is a bijection on the grid
    assert(got.map(_.getAs[Long]("z")).distinct.length == got.length)
  }

  test("zOrderBy: partitions carry disjoint, internally sorted z-ranges") {
    val df = Tables.orders(spark, TestSpark.sf0001)
    val x = col("o_custkey") % 1024
    val y = datediff(col("o_orderdate"), to_date(lit("1970-01-01"))) % 1024
    val laid = Lakehouse.zOrderBy(df, x, y, bits = 10, numPartitions = 8)
    // recompute z on the laid-out frame and check per-partition order/ranges
    val zCol = Lakehouse.zValue(col("o_custkey") % 1024,
      datediff(col("o_orderdate"), to_date(lit("1970-01-01"))) % 1024, 10)
    val parts = laid.select(zCol.cast("long").as("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .orderBy("lo").collect()
    assert(parts.map(_.getAs[Long]("n")).sum == df.count())
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"))
      case _ =>
    }
    // and rows are sorted within partitions (the layout contract for
    // row-group min/max pruning)
    import spark.implicits._
    val unsorted = laid.select(zCol.cast("long").as("z")).mapPartitions { it =>
      val zs = it.map(_.getLong(0)).toSeq
      Iterator.single(if (zs == zs.sorted) 0 else 1)
    }.reduce(_ + _)
    assert(unsorted == 0)
  }
}
