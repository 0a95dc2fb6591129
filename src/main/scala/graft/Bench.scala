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
    // warm-up: JIT + codegen cache + file listing (failures surface in the
    // timed pass — don't double-report)
    qs.foreach(q => try exec(q) catch { case _: Throwable => () })
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = qs.map { q =>
      val t0 = System.nanoTime()
      val ok = try { exec(q); true } catch {
        case t: Throwable =>
          System.err.println(s"BENCH FAILURE ${q.name}: ${t.getClass.getName}: ${t.getMessage}")
          errors(q.name) = Option(t.getMessage).getOrElse(t.getClass.getName).take(200)
          false
      }
      q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
      }.mkString(",\"errors\":{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
