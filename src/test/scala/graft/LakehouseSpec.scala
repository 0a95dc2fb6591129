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
    val bloom = dim.stat.bloomFilter("l_orderkey", 1L << 16, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    val total = li.count()
    val passed = li.filter(might(col("l_orderkey"))).count()
    val exact = li.join(dim, Seq("l_orderkey")).count()
    // no false negatives: everything that joins passes the filter;
    // real pruning: far fewer than all rows pass (urgent ≈ 1/5 of orders)
    assert(passed >= exact)
    assert(passed < total / 2, s"bloom passed $passed of $total — no pruning?")
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
