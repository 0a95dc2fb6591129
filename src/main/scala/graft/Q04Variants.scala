package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch (not part of the contract): measure rewrite candidates for
  * the shuffle-heavy semi-join family at a replica dir, declared plan vs
  * candidate, with shuffle volume per run.
  *
  *  - q04: EXISTS(l_shipdate > o_orderdate + 30) is per-order equivalent
  *    to max(l_shipdate) > o_orderdate + 30, and max() is map-side
  *    combinable — the candidate shuffles (orderkey, max_date) partials
  *    instead of all lineitem rows. The q06 lesson (a per-orderkey
  *    pre-agg measured WORSE at ×1000 because the replica scatters each
  *    order's rows and the partial agg reduced nothing) says decide by
  *    measurement.
  *  - q10: customer LEFT SEMI orders can only broadcast the RIGHT side,
  *    and orders is the big side — the semi shuffles every orders row.
  *    EXISTS ignores multiplicity, so the candidate probes
  *    orders.select(o_custkey).distinct() instead: partial aggregation
  *    dedups map-side (~100 orders per custkey), shrinking the exchange
  *    ~100× before the join.
  *
  * Usage: runMain graft.Q04Variants <dir>
  */
object Q04Variants {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus, "graft-q04var")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffle = new java.util.concurrent.atomic.AtomicLong
    val shufRec = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          }
        }
      })

    def q04Declared(): DataFrame = SparkEntry.queries("q04_exists_priority")(spark, dir)

    def q04PreAgg(): DataFrame = {
      val o = Tables.orders(spark, dir)
      val lmax = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("max_ship"))
      o.join(lmax, o("o_orderkey") === lmax("l_orderkey") &&
          lmax("max_ship") > o("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }

    def q10Declared(): DataFrame = SparkEntry.queries("q10_semi_join")(spark, dir)

    def q10Distinct(): DataFrame = {
      val c = Tables.customer(spark, dir)
      val oKeys = Tables.orders(spark, dir).select(col("o_custkey")).distinct()
      c.join(oKeys, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }

    def time(name: String, f: () => DataFrame): Unit = {
      spark.sparkContext.setJobDescription(s"variant: $name")
      shuffle.set(0); shufRec.set(0)
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let the listener bus drain
      println(f"[variant] $name: $s%.2f s shuffleRecords=${shufRec.get} shuffleBytes=${shuffle.get}")
    }

    val variants = Seq(
      "q04_declared" -> (q04Declared _), "q04_preagg" -> (q04PreAgg _),
      "q10_declared" -> (q10Declared _), "q10_distinct" -> (q10Distinct _))
    // warm-up (file listing + codegen), then timed
    variants.foreach { case (n, f) =>
      try f().write.format("noop").mode("overwrite").save()
      catch { case t: Throwable => println(s"warmup $n failed: $t") }
    }
    variants.foreach { case (n, f) => time(n, f) }
    // q04 equality is cheap at any scale (5 output rows); q10's output is
    // customer-sized, so compare counts + a checksum instead of collect
    val a = q04Declared().collect().map(_.toString).sorted.toSeq
    val b = q04PreAgg().collect().map(_.toString).sorted.toSeq
    println(s"[variant] q04 equal=${a == b}")
    def q10Sum(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: summing 2^63-range hashes overflows under ANSI
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("c_custkey"), col("c_name"))))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    println(s"[variant] q10 declared=${q10Sum(q10Declared())} distinct=${q10Sum(q10Distinct())}")
    spark.stop()
  }
}
