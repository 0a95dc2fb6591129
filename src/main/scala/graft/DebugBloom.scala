package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: measure the q104 Bloom prefilter's actual prune rate and
  * the q63 salted-join plan at a given SF dir. */
object DebugBloom {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32", "graft-debugbloom")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val t0 = System.nanoTime()
    val n = dim.count()
    println(s"dim count: $n (${(System.nanoTime()-t0)/1e9}s)")
    val t1 = System.nanoTime()
    val bloom = operators.BloomJoin.buildFilter(dim, "l_orderkey", -1, 0.01,
      operators.BloomJoin.DefaultMaxFilterBytes).get
    println(s"filter: bitSize=${bloom.bitSize()} expectedFpp=${bloom.expectedFpp()} build=${(System.nanoTime()-t1)/1e9}s")
    val total = li.count()
    val t2 = System.nanoTime()
    val passed = li.filter(functions.BloomContainsLong(col("l_orderkey"), bloom)).count()
    println(s"fact total=$total passed=$passed frac=${passed.toDouble/total} probeScan=${(System.nanoTime()-t2)/1e9}s")
    val exact = li.join(dim, Seq("l_orderkey")).count()
    println(s"exact join rows=$exact")
    // q63 plan check
    val q63 = SparkEntry.queries("q63_salted_join")(spark, dir)
    val opt = q63.queryExecution.optimizedPlan.toString
    println("q63 salted: " + opt.contains("__salt"))
    spark.stop()
  }
}
