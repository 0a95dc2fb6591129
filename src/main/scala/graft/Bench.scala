package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (QueryDef.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully executed
  * via the `noop` sink so projection-only queries can't be optimized away by
  * a count(). One warm-up pass primes the JVM/codegen caches before timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus, "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(q: QueryDef): Unit =
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()

    val qs = SparkEntry.benchQueries
    // warm-up: JIT + codegen cache + file listing
    qs.foreach(q => try exec(q) catch { case _: Throwable => () })
    val results = qs.map { q =>
      val t0 = System.nanoTime()
      try exec(q) catch { case _: Throwable => () }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
