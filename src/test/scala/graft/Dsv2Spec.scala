package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom DataSourceV2 connector: ranged partitioning, column pruning
  * pushed into the reader, deterministic generation. */
class Dsv2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def synth(rows: Long, parts: Int) =
    spark.read.format("graft.sources.v2.SyntheticEventsProvider")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("generates the requested rows across the requested partitions") {
    val df = synth(1000, 7)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.select(countDistinct(col("id"))).head.getLong(0) == 1000)
  }

  test("column pruning reaches the scan") {
    val pruned = synth(100, 2).select(col("id"))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scan.exists(_.fieldNames.toSeq == Seq("id")),
      s"expected pruned schema [id], got $scan")
  }

  test("generation is deterministic and field formulas hold") {
    val rows = synth(500, 3).orderBy(col("id")).collect()
    assert(rows.length == 500)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == id % 150)
      assert(r.getString(3) ==
        graft.sources.v2.SyntheticEvents.types(((id * 7) % 5).toInt))
      assert(r.getDouble(4) == (((id % 9973) * 31 + 7) % 1000).toDouble / 10.0)
    }
    // re-read yields identical data
    val again = synth(500, 3).orderBy(col("id")).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("id-range filters push into partition planning; others stay residual") {
    val df = synth(1000, 4).filter(col("id") >= 990 && col("id") < 996)
    assert(df.count() == 6)
    // the pushed range narrows the generated partitions themselves
    val scanDesc = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scanDesc.contains("range=[990,996)"), s"scan: $scanDesc")
    // only 6 ids exist at the RDD level — nothing was generated then dropped
    assert(df.select(col("id")).rdd.count() == 6)
    // a non-id filter is NOT absorbed: range stays full, filter applied above
    val resid = synth(1000, 4).filter(col("event_type") === "view")
    val residDesc = resid.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(residDesc.contains("range=[0,1000)"), s"scan: $residDesc")
    assert(resid.count() == synth(1000, 4).collect()
      .count(_.getString(3) == "view"))
    // contradictory bounds produce an empty, not negative, range
    assert(synth(100, 2).filter(col("id") > 50 && col("id") < 10).count() == 0)
  }

  test("ungrouped count/min/max push to the source as range arithmetic") {
    val df = synth(5000, 8).agg(
      count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val desc = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(desc.contains("AGG-PUSHED"), s"aggregate not pushed: $desc")
    assert(df.head.toSeq == Seq(5000L, 0L, 4999L))
    // composes with filter pushdown: the range narrows first
    val filtered = synth(5000, 8).filter(col("id") >= 1000 && col("id") < 4000)
      .agg(count(lit(1)), min(col("id")), max(col("id")))
    val fdesc = filtered.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(fdesc.contains("AGG-PUSHED") && fdesc.contains("range=[1000,4000)"), fdesc)
    assert(filtered.head.toSeq == Seq(3000L, 1000L, 3999L))
  }

  test("non-pushable aggregates fall back to a normal scan and stay correct") {
    // group-by and sum-over-generated-values are declined by the source
    val grouped = synth(1000, 4).groupBy(col("event_type")).count()
    val gdesc = grouped.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(!gdesc.contains("AGG-PUSHED"), gdesc)
    assert(grouped.agg(sum("count")).head.getLong(0) == 1000L)
    val summed = synth(1000, 4).agg(sum(col("user_id")))
    assert(summed.head.getLong(0) ==
      (0L until 1000L).map(_ % 150).sum)
  }

  test("uneven division still covers exactly the row range") {
    val df = synth(10, 3)
    assert(df.count() == 10)
    assert(df.agg(min(col("id")), max(col("id"))).head.toSeq == Seq(0L, 9L))
  }
}
