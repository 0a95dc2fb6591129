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

  test("uneven division still covers exactly the row range") {
    val df = synth(10, 3)
    assert(df.count() == 10)
    assert(df.agg(min(col("id")), max(col("id"))).head.toSeq == Seq(0L, 9L))
  }
}
