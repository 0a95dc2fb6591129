package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse table-maintenance operators: slowly-changing-dimension
  * versioning (the warehouse-side generalization of the reference's
  * append-only dim loads) and Z-order clustering for multi-column scan
  * pruning. Complements `jobs.Warehouse` (view/table materialization,
  * compaction, incremental refresh).
  */
object Lakehouse {

  /** SCD Type-2 versioning from a change log: one output row per change,
    * carrying its validity interval. Within each `key` partition, changes
    * order by (`orderCol`, `tiebreak`); `valid_from` is the change's own
    * timestamp, `valid_to` the next change's (NULL = current version,
    * flagged `is_current`).
    *
    * Scale shape: a single window PARTITIONED by the dimension key —
    * parallel across keys, never a global sort; version chains are bounded
    * by per-key change counts. This is the standard CDC-merge target shape:
    * downstream as-of lookups join `fact.ts BETWEEN valid_from AND
    * valid_to` (the q52/q83 banded-join machinery applies directly). */
  def scd2(changes: DataFrame, key: String, orderCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol), col(tiebreak))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Z-value (Morton code) of two non-negative dimensions, `bits` low bits
    * each, x in even positions, y in odd. Rows close in BOTH dimensions get
    * close z-values, so sorting by z co-clusters 2-D ranges — the layout
    * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
    *
    * Why it matters at 100 TB: parquet row-group min/max stats prune a
    * linear sort on ONE column; a z-ordered layout prunes predicates on
    * EITHER or BOTH columns (each row group covers a small z-range ⇒ a
    * small rectangle in (x, y) space). Pure bitwise expression — codegen'd,
    * shuffle-free; the layout itself materializes via [[zOrderBy]]. */
  def zValue(x: Column, y: Column, bits: Int = 10): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(1), 2 * i)
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Materialize a z-ordered layout: range-partition on the z-value (no
    * global sort — range exchange + per-partition sort), ready for
    * `.write.parquet`. Each output file then spans a compact z-range. */
  def zOrderBy(df: DataFrame, x: Column, y: Column, bits: Int = 10,
      numPartitions: Int = 32): DataFrame = {
    val z = zValue(x, y, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
