package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
