package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Per-EXCHANGE shuffle attribution: execute named queries and report every
  * shuffle exchange's record/byte counts plus its child node, so an
  * anomalous per-query shuffle total (Bench's tripwire granularity)
  * localizes to the exchange that moved — this is what found the q90
  * late-AQE-flip misplan in round 8 (239 M-record corpus-side exchange
  * behind a join AQE "saved").
  *
  * Round 9 promoted it from a dev main to a per-round regression artifact:
  * with SPARK_GRAFT_DIAG_OUT set it writes machine-readable JSON
  * ({query -> {exchanges: [{records, bytes, child, node}], joins: [...]}}),
  * which tools/collect_round.py snapshots into bench/r<NN>/
  * diag_shuffle.json for the heavy-cohort drift compare in PERF.md.
  *
  * Usage: runMain graft.DiagShuffle <sfDir> <name1,name2>
  */
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
    def jstr(s: String): String =
      "\"" + s.replaceAll("[\\\\\"]", " ").replaceAll("[\\x00-\\x1f]", " ") +
        "\""
    val perQuery = sel.split(",").map { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THROUGH the df's own QueryExecution (a write would plan a
      // fresh one, leaving these metrics at zero)
      df.queryExecution.toRdd.count()
      println(s"########## $name ##########")
      val exchanges = nodes(df.queryExecution.executedPlan).collect {
        case s: ShuffleExchangeLike =>
          val rec = s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(-1L)
          val b = s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)
          val child = s.children.headOption.map(_.nodeName).getOrElse("?")
          println(f"  exchange $rec%,d rec / $b%,d B  <- $child  [${s.nodeName}]")
          (rec, b, child, s.nodeName)
      }
      println("  --- joins in executed plan:")
      val joins = nodes(df.queryExecution.executedPlan)
        .filter(p => p.nodeName.toLowerCase.contains("join"))
        .map(_.nodeName)
      joins.foreach(j => println(s"  $j"))
      val exJson = exchanges.map { case (r, b, c, n) =>
        s"""{"records":$r,"bytes":$b,"child":${jstr(c)},"node":${jstr(n)}}"""
      }.mkString("[", ",", "]")
      val jJson = joins.map(jstr).mkString("[", ",", "]")
      s"""${jstr(name)}:{"exchanges":$exJson,"joins":$jJson}"""
    }
    sys.env.get("SPARK_GRAFT_DIAG_OUT").foreach { outPath =>
      val line = perQuery.mkString(
        s"""{"sf":${jstr(sfDir)},"queries":{""", ",", "}}")
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"diag json written to $outPath")
    }
    spark.stop()
  }
}
