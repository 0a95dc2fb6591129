package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (SURVEY.md §4 O8 / PERF.md scale path): facts
  * that are repeatedly joined on the same key are written `bucketBy(key)` so
  * the join needs NO shuffle exchange on either side — at 100 TB this turns
  * every recurring fact-fact join from two full-data shuffles into a local
  * zip of pre-sorted buckets.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True if the executed plan contains a shuffle exchange — test hook for
    * asserting co-located joins stay shuffle-free. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
