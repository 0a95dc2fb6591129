package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (QueryDef.bench) against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully executed
  * via the `noop` sink so projection-only queries can't be optimized away by
  * a count(). One warm-up pass primes the JVM/codegen caches before timing;
  * each query is then timed SPARK_GRAFT_BENCH_RUNS times (default 3) and the
  * per-query MEDIAN is reported — single-shot timings on a shared box swing
  * 2-3× on scheduling noise, which is indistinguishable from a real
  * regression (the r1→r2 +29% drift problem).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus, "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(q: QueryDef): Unit =
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()

    // dev-only subset filter (comma-separated names, mirrors Verify's name
    // arg): lets a regression be isolated from its bench neighbors — unset
    // for the driver's full run
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // validate each requested name — a typo'd entry silently dropping one
    // query would read downstream as "nothing regressed"
    only.foreach { names =>
      val known = SparkEntry.benchQueries.map(_.name).toSet
      val unknown = names -- known
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in the bench set: $unknown")
      require(names.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but empty")
    }
    val qs = SparkEntry.benchQueries
      .filter(q => only.forall(_.contains(q.name)))
    // warm-up: JIT + codegen cache + file listing (failures surface in the
    // timed pass — don't double-report)
    qs.foreach(q => try exec(q) catch { case _: Throwable => () })
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timeOnce(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try { exec(q); (System.nanoTime() - t0) / 1e9 } catch {
        case t: Throwable =>
          System.err.println(s"BENCH FAILURE ${q.name}: ${t.getClass.getName}: ${t.getMessage}")
          errors(q.name) = Option(t.getMessage).getOrElse(t.getClass.getName).take(200)
          -1.0
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // interleaved rounds (q1..qn, q1..qn, ...) rather than q1×3, q2×3 — so a
    // transient contention spike hits one ROUND, not all samples of one query
    val samples = (1 to runs).map(_ => qs.map(q => q.name -> timeOnce(q)))
    val results = qs.map { q =>
      val vals = samples.map(_.find(_._1 == q.name).get._2)
      q.name -> (if (vals.exists(_ < 0)) -1.0 else median(vals))
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.filter(_._2 >= 0).map(_._2).sum
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
      }.mkString(",\"errors\":{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$runs,"queries":$qJson$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
