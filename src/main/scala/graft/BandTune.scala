package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: A/B the banded-interval-join band width on the q83 query
  * shape at a given SF dir (`runMain graft.BandTune <sfDir>`). Measures
  * median-of-3 per divisor of the interval span — the evidence behind the
  * band-width choice in [[graft.plans.BandedIntervalJoinRule]]. */
object BandTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32", "graft-bandtune")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, sfDir)
    val spanUs = 30L * 60 * 1000000
    def run(bandUs: Long): Double = {
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
        .withColumn("lo", col("p_ts") - expr("INTERVAL 30 MINUTE"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("ts").as("v_ts"))
      val q = RangeJoin.bandedIntervalJoin(v, "v_ts", p, "lo", "p_ts", bandUs)
        .groupBy(col("purchase_id"))
        .agg(count(lit(1)).as("n_views"), min(col("view_id")).as("first_view"))
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    run(spanUs) // warm-up
    for (div <- Seq(1, 2, 4, 8, 16)) {
      val t = run(spanUs / div)
      println(f"band=span/$div%-2d (${spanUs / div / 1000000}%4d s)  median $t%.3f s")
    }
  }
}
