package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Warehouse materialization semantics (SURVEY.md §2.2 K6; reference:
  * dbt staging models materialize as VIEWS, marts as TABLES —
  * dbt/dbt_project.yml:20-24). Staging = temp view (recomputed per query,
  * always fresh lineage); mart = saved table (materialized once, scanned by
  * consumers). */
object Warehouse {

  /** staging model: logical view, recomputed on every reference. */
  def stageView(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** mart model: physically materialized managed table. */
  def martTable(spark: SparkSession, name: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(name)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Lake maintenance: compact a partitioned parquet directory's small
    * files (the debris a micro-batch sink leaves — one file per batch per
    * partition) into one file per partition directory, preserving both data
    * and partition layout (hash-repartitioning on the partition column puts
    * each partition value in exactly one task, so partitionBy emits one
    * file per directory). Write-to-temp + swap keeps the path readable
    * throughout, the same atomic-publish pattern as the index builder. At
    * 100 TB small files are a real planner/NN cost: compaction bounds file
    * counts without touching row data. */
  def compact(spark: SparkSession, path: String, partCol: String): Unit = {
    val tmp = path + "_compact_tmp"
    spark.read.parquet(path)
      .repartition(col(partCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Incremental mart refresh (dbt's `materialized: incremental` semantics
    * over a date-partitioned lake): recompute ONLY the partitions whose
    * `partCol` value appears in `freshSource`, and replace exactly those
    * partitions in the mart via dynamic partition overwrite. At 100 TB this
    * is the difference between reprocessing one day and reprocessing the
    * table; untouched partitions are never read or written.
    *
    * `transform` maps the fresh slice of the source to mart rows and must
    * carry `partCol` through. Idempotent: re-running with the same source
    * rewrites the same partitions. */
  def refreshIncremental(spark: SparkSession, martPath: String,
      freshSource: DataFrame, partCol: String,
      transform: DataFrame => DataFrame): Unit =
    transform(freshSource)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(martPath)
}
