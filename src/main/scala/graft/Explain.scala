package graft

import org.apache.spark.sql.SparkSession

/** Dev main: dump formatted physical plans for the headline queries so plan
  * quality (pushdown, broadcast choice, TakeOrderedAndProject, codegen
  * spans) is auditable. Usage: runMain graft.Explain [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), "8", "graft-explain").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dev-only session-conf overrides ("k=v;k=v") — e.g. disable an
    // optimizer rule to print a query's before/after plan pair
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries.map(_.name)
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
