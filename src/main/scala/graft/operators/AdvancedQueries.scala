package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second-wave operator coverage: sessionization (gap-based), statistical
  * aggregates, JSON scalar surface (F21/F22), map functions (F20).
  */
object AdvancedQueries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  /** q27: gap-based sessionization (30-min inactivity) — lag window + count
    * of session starts, the batch form of the streaming session-window
    * operator. One shuffle on user_id. */
  private def q27(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  private val q27Sql =
    """WITH o AS (SELECT user_id, event_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |           FROM events)
      |SELECT user_id,
      |  CAST(count(*) FILTER (prev IS NULL OR ts - prev > INTERVAL 30 MINUTE) AS BIGINT)
      |    AS n_sessions,
      |  count(*) AS n_events
      |FROM o GROUP BY user_id""".stripMargin

  /** q28: statistical aggregates — sample stddev, exact interpolated median,
    * Pearson correlation. */
  private def q28(s: SparkSession, d: String): DataFrame =
    li(s, d).groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 2).as("median_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"))

  private val q28Sql =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
      |  round(quantile_cont(l_extendedprice, 0.5), 2) AS median_price,
      |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** q29: JSON parse of the event props payload (F22) + agg over the
    * extracted field. */
  private def q29(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"),
        sum(col("k")).cast("long").as("k_sum"),
        round(avg(col("k")), 4).as("k_avg"))

  private val q29Sql =
    """SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
      |  round(avg(k), 4) AS k_avg
      |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INTEGER) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** q44: approx distinct (HLL sketch, SURVEY §2.5 A6 scale path) alongside
    * the exact count — rows-only (the sketch estimate is engine-specific). */
  private def q44(s: SparkSession, d: String): DataFrame =
    li(s, d).agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))

  /** q45: embedding-cosine near-dup pairs (north-star dedup family) —
    * brute-force oracle baseline; the scale path reuses Similarity's LSH
    * buckets as the candidate generator. Integer ids + identical double
    * folds keep the oracle exact. */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("da"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("db"), col("embedding").as("eb"))
    val sim = graft.functions.CosineSimilarity(col("ea"), col("eb"))
    a.join(b, col("da") < col("db"))
      .filter(sim >= 0.5)
      .select(round(sim, 4).as("simr"), col("da"), col("db"))
  }

  private val q45Sql =
    """WITH n AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      |  FROM embeddings),
      |p AS (SELECT a.vec_id AS da, b.vec_id AS db,
      |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))) / (a.nm * b.nm) AS sim
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |SELECT round(sim, 4) AS simr, da, db FROM p WHERE sim >= 0.5""".stripMargin

  /** q46: full-text-search inverted postings (SURVEY §2.9 L13): term →
    * document-frequency + sorted posting list. explode → groupBy(term) is
    * the classic distributed index build (one shuffle on term). */
  private def q46(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"),
        concat_ws(",", sort_array(collect_set(col("doc_id")))).as("postings"))
      .filter(col("freq") >= 900)

  private val q46Sql =
    """SELECT word, count(*) AS freq,
      |  array_to_string(list_sort(list_distinct(list(doc_id))), ',') AS postings
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word HAVING count(*) >= 900""".stripMargin

  /** q49: correlated-subquery shape (decorrelated as a per-group aggregate
    * join): lineitems whose quantity exceeds 1.2× their part's average.
    * Group sums of integral doubles are exact, so the filter boundary is
    * deterministic across engines. */
  private def q49(s: SparkSession, d: String): DataFrame = {
    val l = li(s, d)
    val partAvg = l.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    l.join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") > col("avg_qty") * 1.2)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("qty"))
  }

  private val q49Sql =
    """SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT) AS qty
      |FROM lineitem l
      |WHERE l_quantity > 1.2 * (SELECT avg(l_quantity) FROM lineitem
      |                          WHERE l_partkey = l.l_partkey)""".stripMargin

  /** q47: multimodal feature extraction — synthetic binary media (decode is
    * a documented stub; the Spark-side schema/batching/shape is real).
    * Output: per-kind feature aggregates. Rows-only. */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(s, 64))
    feats.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(element_at(col("features"), 1)), 4).as("f0_avg"))
  }

  /** q48: language-ID over the documents corpus — prediction distribution
    * vs the synthetic label (the corpus is English-ish word salad, so this
    * exercises the operator shape, not linguistic accuracy). Rows-only. */
  private def q48(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), LangId.predict(col("text")).as("pred"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))

  val all: Seq[QueryDef] = Seq(
    QueryDef("q27_sessionize", q27, Some(q27Sql), bench = true),
    QueryDef("q28_stats_agg", q28, Some(q28Sql)),
    QueryDef("q29_json_extract", q29, Some(q29Sql)),
    QueryDef("q44_approx_distinct", q44, None),
    QueryDef("q45_embedding_neardup", q45, Some(q45Sql)),
    QueryDef("q46_fts_postings", q46, Some(q46Sql)),
    QueryDef("q47_media_features", q47, None),
    QueryDef("q48_langid", q48, None),
    QueryDef("q49_above_part_avg", q49, Some(q49Sql)))
}
