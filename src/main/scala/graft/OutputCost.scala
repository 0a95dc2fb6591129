package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for the q46 output-bound adjudication (round-9
  * verdict #4): q46's ×100 residual was hypothesized to be OUTPUT
  * construction (the ≥900-occurrence head is ~the whole 31-word vocab on
  * this corpus, so the sorted posting-id strings are ~140 MB at ×100 —
  * work BOTH engines pay, not a plan defect). This main times, on a given
  * corpus dir, (a) the full q46 and (b) the same two-pass plan WITHOUT
  * the posting-string materialization (frequency head only), both fully
  * executed via the noop sink, 3-run medians after a warm-up. The
  * difference isolates Spark's posting-construction cost; the companion
  * DuckDB decomposition (tools/ command recorded in PERF.md) isolates the
  * oracle's. Usage: runMain graft.OutputCost <dir> */
object OutputCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus, "graft-outcost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def full() = SparkEntry.queries("q46_fts_postings")(spark, dir)
    def head() = {
      val d0 = Tables.documents(spark, dir)
      d0.select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 900)
    }
    def time(mk: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median3(mk: () => org.apache.spark.sql.DataFrame): Double = {
      time(mk) // warm-up
      Seq.fill(3)(time(mk)).sorted.apply(1)
    }
    val h = median3(head _)
    val f = median3(full _)
    println(f"""{"dir":"$dir","full_s":$f%.3f,"head_s":$h%.3f,"posting_construction_s":${f - h}%.3f}""")
    spark.stop()
  }
}
