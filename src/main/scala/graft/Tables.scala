package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (TESTDATA.md):
  * TPC-H-ish star schema + `events` stream table + `documents`/`embeddings`
  * text/similarity corpora, one parquet file per table under the sf dir.
  *
  * Parquet carries the schema, so no inferSchema pass is ever needed; filters
  * and column pruning push down to the scan (verified via `.explain`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.parquet stores TIMESTAMP(NANOS) which Spark reads only as a
    // nanos-since-epoch LONG (spark.sql.legacy.parquet.nanosAsLong). Convert
    // to TimestampType by integral-dividing to micros — the same truncation
    // DuckDB applies when it loads nanos into its micros timestamps.
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    // A writer flagging the micros column isAdjustedToUTC=false surfaces as
    // TIMESTAMP_NTZ, which time-arithmetic functions (unix_micros, windows)
    // reject. The session timezone is pinned UTC (GraftSession), so casting
    // to TimestampType keeps the exact same micros — and matches DuckDB,
    // which reads the naive value as a plain TIMESTAMP either way.
    else if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts",
        df("ts").cast(org.apache.spark.sql.types.TimestampType))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** A named engine query plus (optionally) the ANSI-SQL oracle the driver runs
  * in DuckDB over the same parquet tables. Column names/aliases MUST match
  * between the two — the driver sorts columns by name before hashing values.
  *
  * Determinism rules used throughout:
  *  - every double-valued output column is `round(x, n)` on BOTH sides, so
  *    summation-order ULP differences can't flip the hash;
  *  - integer-valued sums are cast to BIGINT on both sides (DuckDB's sum of
  *    integers is HUGEINT, Spark's is LONG);
  *  - order-sensitive results (top-k, concat aggs) carry a total order with a
  *    unique tiebreak key on both sides.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
