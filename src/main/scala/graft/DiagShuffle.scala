package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Dev diagnostic (not part of the contract): execute a named query and
  * print every shuffle exchange's record/byte counts plus its child node,
  * to attribute an anomalous total shuffle volume to the exchange that
  * carries it. Usage: runMain graft.DiagShuffle <sfDir> <name1,name2> */
object DiagShuffle {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, sel) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus, "graft-diag")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case _ => p.children.flatMap(nodes)
    }) :+ p
    sel.split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THROUGH the df's own QueryExecution (a write would plan a
      // fresh one, leaving these metrics at zero)
      df.queryExecution.toRdd.count()
      println(s"########## $name ##########")
      nodes(df.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeLike =>
          val rec = s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(-1L)
          val b = s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)
          val child = s.children.headOption.map(_.nodeName).getOrElse("?")
          println(f"  exchange $rec%,d rec / $b%,d B  <- $child  [${s.nodeName}]")
      }
      println("  --- joins in executed plan:")
      nodes(df.queryExecution.executedPlan)
        .filter(p => p.nodeName.toLowerCase.contains("join"))
        .foreach(p => println(s"  ${p.nodeName}"))
    }
    spark.stop()
  }
}
