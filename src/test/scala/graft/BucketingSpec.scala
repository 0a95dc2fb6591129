package graft

import graft.jobs.Bucketing
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: same-bucketed tables must join with no shuffle
  * exchange on either side (the recurring-join scale path). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same-bucketed fact tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    Bucketing.writeBucketed(
      Tables.lineitem(spark, TestSpark.sf0001)
        .select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, TestSpark.sf0001)
        .select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
    assert(joined.count() > 0)
    assert(!Bucketing.hasShuffle(joined),
      s"expected shuffle-free bucketed join:\n${joined.queryExecution.executedPlan}")
    // contrast: the plain parquet join of the same data DOES shuffle (or
    // broadcasts — either way the bucketed plan must not hash-exchange)
  }
}
