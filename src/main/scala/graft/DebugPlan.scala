package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (not part of the contract): print the OPTIMIZED
  * logical plan of named queries — join-order debugging at the level
  * DimsFirstJoinReorder operates on.
  * Usage: runMain graft.DebugPlan <sfDir> <name1,name2,...>
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sel) = args
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), "8", "graft-debugplan").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sel.split(",").foreach { n =>
      println(s"\n########## $n ##########")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.optimizedPlan.treeString)
    }
    spark.stop()
  }
}
