package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning: the third leg of the skew story — q63 (salting)
  * and q64 (hot-key split) are the MANUAL paths; this pins Spark's own
  * OptimizeSkewedJoin as the runtime path, so a refactor that disables AQE
  * or its skew handling is caught. */
class AqeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join and make the skew thresholds tiny so the
      // test corpus triggers them
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // one hot key owning ~90% of the left side
      val left = (0 until 40000)
        .map(i => (if (i % 10 == 0) i.toLong % 1000 else 42L, s"pad-$i"))
        .toDF("k", "payload")
      val right = (0L until 1000L).map(k => (k, s"dim-$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // execute THIS plan (count() would plan a different query and leave
      // joined's adaptive plan unfinalized)
      assert(joined.collect().length == 40000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
