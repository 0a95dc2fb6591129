package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query; those with an ANSI-SQL equivalent carry a DuckDB oracle.
  */
object SparkEntry {

  /** All query modules, merged. Names are unique by construction (asserted
    * in the test suite). */
  def defs: Seq[QueryDef] =
    RelationalQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      AdvancedQueries.all ++ ScaleQueries.all ++ MlbQueries.all ++
      CurationQueries.all ++ LakehouseQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    defs.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Headline subset used by Bench. */
  def benchQueries: Seq[QueryDef] = defs.filter(_.bench)
}
