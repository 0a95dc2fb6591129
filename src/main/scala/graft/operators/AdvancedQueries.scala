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
        // stddev rounds at 1 decimal, not 2: Spark (Welford) and DuckDB
        // (sum-of-squares) accumulate differently, so the doubles differ by
        // ~1e-5 and a 0.01 quantum sits inside the divergence at small SF
        round(stddev_samp(col("l_extendedprice")), 1).as("sd_price"),
        // interpolated median of two 2-decimal values is a .xx5 multiple —
        // exactly the boundary where Spark's shortest-decimal HALF_UP round
        // and DuckDB's binary round disagree. ×200 turns it into the exact
        // integer cents-sum of the two middle values on both engines.
        round(percentile(col("l_extendedprice"), lit(0.5)) * 200, 0)
          .cast("long").as("median_x200"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"))

  private val q28Sql =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_extendedprice), 1) AS sd_price,
      |  CAST(round(quantile_cont(l_extendedprice, 0.5) * 200, 0) AS BIGINT) AS median_x200,
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

  /** q44: approx distinct (HLL sketch, SURVEY §2.5 A6 scale path) checked
    * as an accuracy contract: the sketch value itself is engine-specific,
    * but "estimate within 5% of exact" is deterministic (the sketch is
    * deterministic for fixed data), so the oracle asserts exact count +
    * contract-held. */
  private def q44(s: SparkSession, d: String): DataFrame =
    li(s, d).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .select(col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) /
          col("exact_parts") <= 0.05).cast("int").as("approx_within_5pct"))

  private val q44Sql =
    """SELECT count(DISTINCT l_partkey) AS exact_parts,
      |  1 AS approx_within_5pct
      |FROM lineitem""".stripMargin

  /** q101: MERGEABLE sketches — the pattern that makes approximate distinct
    * re-aggregable at 100 TB: per-group partial HLL sketches (one shuffle,
    * map-side combinable), then `hll_union_agg` merges the group sketches
    * into a global estimate WITHOUT rescanning the fact — the same sketch
    * column could be persisted in a daily mart and unioned across days.
    * Naively summing per-group distincts would double-count keys that
    * appear in several groups; the union is the correct algebra. Contract
    * oracle like q44: the estimate is engine-specific but deterministic, so
    * "merged estimate within 5% of exact" + the exact count gate it. */
  private def q101(s: SparkSession, d: String): DataFrame = {
    val partial = li(s, d).groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
    val merged = partial.agg(
      count(lit(1)).as("n_groups"),
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx"))
    val exact = li(s, d).agg(countDistinct(col("l_partkey")).as("exact_parts"))
    merged.crossJoin(broadcast(exact))
      .select(col("exact_parts"), col("n_groups"),
        (abs(col("approx") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.05).cast("int").as("merged_within_5pct"))
  }

  private val q101Sql =
    """SELECT count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_returnflag) AS n_groups,
      |  1 AS merged_within_5pct
      |FROM lineitem""".stripMargin

  /** q155: set-OVERLAP estimation from mergeable sketches — the way a
    * 100 TB pipeline estimates benchmark contamination / audience overlap
    * WITHOUT the distinct-join: one HLL sketch per side (each a one-pass
    * combinable aggregate, persistable in a mart), |A∩B| by
    * inclusion-exclusion over the side sketches and their lossless union
    * (`hll_union_agg` — the sketch algebra q101 established). Contract
    * oracle: exact values from a single Expand-free pass (engine) /
    * conditional distincts (DuckDB); the booleans pin the side estimates
    * within 5% and the derived overlap within 10% (inclusion-exclusion
    * compounds the per-sketch error; measured ≪1% at lgK=14). */
  private def q155(s: SparkSession, d: String): DataFrame = {
    val types = Seq("view", "purchase")
    val perType = ev(s, d)
      .filter(col("event_type").isInCollection(types))
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    val ests = perType.agg(
      max(when(col("event_type") === "view",
        hll_sketch_estimate(col("sk")))).as("est_v"),
      max(when(col("event_type") === "purchase",
        hll_sketch_estimate(col("sk")))).as("est_p"),
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est_u"))
    val exact = ev(s, d).agg(
      countDistinct(when(col("event_type") === "view", col("user_id")))
        .as("exact_view"),
      countDistinct(when(col("event_type") === "purchase", col("user_id")))
        .as("exact_purchase"),
      countDistinct(when(col("event_type").isInCollection(types),
        col("user_id"))).as("exact_u"))
    ests.crossJoin(broadcast(exact))
      .select(col("exact_view"), col("exact_purchase"),
        (col("exact_view") + col("exact_purchase") - col("exact_u"))
          .as("exact_overlap"),
        ((abs(col("est_v") - col("exact_view")).cast("double") /
            col("exact_view") <= 0.05) &&
          (abs(col("est_p") - col("exact_purchase")).cast("double") /
            col("exact_purchase") <= 0.05)).cast("int")
          .as("sides_within_5pct"),
        (abs(col("est_v") + col("est_p") - col("est_u") -
            (col("exact_view") + col("exact_purchase") - col("exact_u")))
          .cast("double") /
          (col("exact_view") + col("exact_purchase") - col("exact_u"))
          <= 0.10).cast("int").as("overlap_within_10pct"))
  }

  private val q155Sql =
    """SELECT
      |  CAST(count(DISTINCT CASE WHEN event_type = 'view'
      |    THEN user_id END) AS BIGINT) AS exact_view,
      |  CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
      |    THEN user_id END) AS BIGINT) AS exact_purchase,
      |  CAST(count(DISTINCT CASE WHEN event_type = 'view'
      |      THEN user_id END) AS BIGINT)
      |  + CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
      |      THEN user_id END) AS BIGINT)
      |  - CAST(count(DISTINCT CASE WHEN event_type IN ('view', 'purchase')
      |      THEN user_id END) AS BIGINT) AS exact_overlap,
      |  1 AS sides_within_5pct,
      |  1 AS overlap_within_10pct
      |FROM events""".stripMargin

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

  /** q84: embedding-cosine near-dup via LSH-bucketed candidates — the scale
    * path for q45's brute-force baseline ([[Dedup.embeddingDupPairs]]:
    * hyperplane sign-bit signature, chunk-band bucket join, exact-cosine
    * verify). Same oracle as q45: the bucketed path must reproduce the
    * brute result bit-for-bit, the q34/q35 contract. */
  private def q84(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingDupPairs(Tables.embeddings(s, d), "embedding", "vec_id")

  /** q136: semantic dedup DECISION (SemDeDup shape) — embedding-cosine
    * near-dup pairs from the LSH scale path (q84), closed into components
    * ([[Dedup.dupComponents]] min-label propagation) and rolled into
    * survivor groups: each component keeps its min vec_id. The full chain —
    * hyperplane bucketing, chunk-band candidate join, exact-cosine verify,
    * iterative closure — is oracle-checked against brute-force pairs plus a
    * recursive-CTE transitive closure (the q89 pattern, on embeddings). */
  private def q136(s: SparkSession, d: String): DataFrame =
    // literally q84's pair pipeline — reusing the def keeps the two from
    // drifting if the LSH parameters are ever tuned
    Dedup.dupGroups(q84(s, d).select(col("da"), col("db")))

  private val q136Sql =
    """WITH RECURSIVE n AS (SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
      |  FROM embeddings),
      |p AS (SELECT a.vec_id AS da, b.vec_id AS db,
      |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))) / (a.nm * b.nm) AS sim
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id),
      |d AS (SELECT da, db FROM p WHERE sim >= 0.5),
      |e AS (SELECT da AS a, db AS b FROM d UNION SELECT db, da FROM d),
      |r AS (SELECT a, b FROM e
      |      UNION
      |      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
      |lab AS (SELECT a AS v, least(a, min(b)) AS comp FROM r GROUP BY a)
      |SELECT comp AS component, count(*) AS n_docs,
      |  array_to_string(list_sort(list(v)), ',') AS members
      |FROM lab GROUP BY comp""".stripMargin

  /** q46: full-text-search inverted postings (SURVEY §2.9 L13): term →
    * document-frequency + sorted posting list, for terms with ≥ 900
    * occurrences.
    *
    * Round-9 shape (×100 yardstick find: 13.4 s / 5.4× DuckDB): the
    * single-pass groupBy(word) with collect_set(doc_id) built doc-id SETS
    * for EVERY term's partial aggregate and only then dropped the cold
    * tail. Now pass 1 computes term frequencies alone (combinable longs,
    * vocab-sized shuffle) and filters to the qualifying hot terms — a
    * driver-bounded set, broadcast back — so pass 2 collects posting
    * lists ONLY for terms that will be emitted, from per-doc-deduped
    * word arrays (no set-merge partials). At 100 TB this is the
    * difference between materializing the full index to report its head
    * and touching the head's postings only. */
  private def q46(s: SparkSession, d: String): DataFrame = {
    val d0 = Tables.documents(s, d)
    val hot = d0
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= 900)
    // no broadcast hint on `hot` (round-9 ADVICE): the ≥900-occurrence
    // set is vocabulary-shaped, not bounded — on this corpus it is ~the
    // whole (31-word) vocab, and at the 100 TB design point a large-vocab
    // corpus could push a forced broadcast past driver/executor limits.
    // AQE sees the aggregate's measured size at runtime and broadcasts
    // exactly while it fits (the yardstick's shuffle-record pin is the
    // tripwire if the join shape ever changes at ×10).
    d0.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("word"))
      .join(hot, "word")
      .groupBy(col("word"), col("freq"))
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("postings"))
      .select(col("word"), col("freq"), col("postings"))
  }

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

  /** q70: binary-column handling under the oracle gate — text encoded to a
    * BinaryType payload (the multimodal column type), then byte length and
    * content digest computed on the binary value; DuckDB reproduces both
    * (md5 of the utf-8 string bytes == md5 of the payload). Complements
    * q47, whose stubbed decode stays rows-only. */
  private def q70(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("digest"))

  private val q70Sql =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |  md5(text) AS digest
      |FROM documents""".stripMargin

  /** q71: date-partitioned lake round-trip (K1 sink + O1 partition pruning
    * in one oracle-gated query): events written partitionBy(ingest_date),
    * read back with a partition filter — the scan touches one date
    * directory, and the result must equal DuckDB filtering the original
    * table. Output columns are exact (counts + id min/max). */
  private def q71(s: SparkSession, d: String): DataFrame = {
    val lake = "/tmp/graft_q71_lake"
    ev(s, d).withColumn("ingest_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("ingest_date").parquet(lake)
    s.read.parquet(lake)
      .filter(col("ingest_date") === lit("2024-01-15").cast("date"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
  }

  private val q71Sql =
    """SELECT event_type, count(*) AS n, min(event_id) AS min_id,
      |  max(event_id) AS max_id
      |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      |GROUP BY event_type""".stripMargin

  /** q166: ORC lake round-trip — the second columnar format on the
    * sink/scan surface (q71 covers parquet): documents written as ORC
    * partitioned by lang, read back under a lang PARTITION filter plus an
    * n_chars predicate PUSHED to the ORC reader, aggregated per source.
    * The result must equal DuckDB over the original parquet table, so
    * any row lost or duplicated in the format round trip flips the hash;
    * PlanSpec asserts both filter classes land on the ORC scan. */
  private def q166(s: SparkSession, d: String): DataFrame = {
    val lake = graft.TempDirs.scratchAtExit("orc_lake")
      .resolve("docs").toString
    Tables.documents(s, d)
      .write.mode("overwrite").partitionBy("lang").orc(lake)
    s.read.orc(lake)
      .filter(col("lang") === "en" && col("n_chars") >= 200)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).cast("long").as("chars"))
  }

  private val q166Sql =
    """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents WHERE lang = 'en' AND n_chars >= 200
      |GROUP BY source""".stripMargin

  /** q75: the batched media feature-extraction path (Multimodal
    * .extractFeatures — mapPartitions over binary payloads, the real
    * decode-batch shape) under the oracle gate: payloads are encoded
    * document text, the decode is the digest-byte stub whose features are
    * exact small integers, and DuckDB recomputes them from md5 hex pairs. */
  private def q75(s: SparkSession, d: String): DataFrame = {
    val media = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.extractFeatures(media, decode = Multimodal.byteDecode)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("f0"),
        element_at(col("features"), 2).cast("int").as("f1"),
        element_at(col("features"), 3).cast("int").as("f2"),
        element_at(col("features"), 4).cast("int").as("f3"))
  }

  private val q75Sql = {
    // hex pair -> int via a 16-char index fold (strpos is 1-based)
    def hexByte(pos: Int) =
      s"""CAST(list_reduce(list_transform(string_split(substr(md5(text), $pos, 2), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |      (a, c) -> a * 16 + c) AS INTEGER)""".stripMargin
    s"""SELECT doc_id,
      |  ${hexByte(1)} AS f0,
      |  ${hexByte(3)} AS f1,
      |  ${hexByte(5)} AS f2,
      |  ${hexByte(7)} AS f3
      |FROM documents""".stripMargin
  }

  /** q76: the watermarked streaming pipeline (ST2+ST4: keyed dedup +
    * tumbling hourly windows, append mode) against a SQL oracle. With the
    * 1-day watermark, append emits exactly the windows whose end the final
    * watermark passed — `end <= max_ts - 1 day` in SQL. Safe here because
    * window ends are hour-exact while the watermark is not (no boundary
    * tie), and the corpus has no conflicting duplicate event_ids (checked),
    * so the stateful dedup is deterministic. total_value (double sum) is
    * excluded; counts are exact. */
  private def q76(s: SparkSession, d: String): DataFrame = {
    val hourly = graft.streaming.EventsStream.hourlyCounts(
      graft.streaming.EventsStream.readEventsDir(s, d))
      .select(col("h"), col("event_type"), col("n"))
    graft.streaming.EventsStream.runToMemory(s, hourly, "q76_hourly")
  }

  private val q76Sql =
    """WITH mx AS (SELECT max(ts) AS max_ts FROM events)
      |SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
      |FROM events, mx
      |GROUP BY 1, 2, max_ts
      |HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= max_ts - INTERVAL 1 DAY""".stripMargin

  /** q88: the stream-stream interval join drained under the oracle (ST7
    * follow-through from q67/q76): view→purchase attribution within a
    * 1-hour horizon, both sides watermarked. INNER stream-stream joins emit
    * eagerly — the watermark governs state EVICTION, not emission — and the
    * single-file source drains in one micro-batch, so the drained result
    * equals the batch interval join exactly: no window-close boundary to
    * dodge, unlike append-mode aggregation (q76). Timestamps leave as epoch
    * micros (exact long round-trip; java.sql.Timestamp is ms-granular). */
  private def q88(s: SparkSession, d: String): DataFrame = {
    val ev = graft.streaming.EventsStream.readEventsDir(s, d)
    val joined = graft.streaming.StreamJoins.viewPurchaseAttribution(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"))
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"))
    graft.streaming.EventsStream.runToMemory(s, joined, "q88_attr")
  }

  private val q88Sql =
    """SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
      |  epoch_us(v.ts) AS view_us, epoch_us(p.ts) AS purchase_us
      |FROM events v JOIN events p
      |  ON v.user_id = p.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR""".stripMargin

  /** q98: native gap-based session windows under the streaming oracle —
    * Spark's `session_window` (dynamic merge-on-overlap state, a DIFFERENT
    * engine surface than the flatMapGroupsWithState sessionizer of q27/q67)
    * run as a real watermarked append-mode drain. Append emits exactly the
    * sessions the final watermark closed: `session_end <= max_ts - 1 day`,
    * where session_end = last event + gap (checked tie-free on this corpus;
    * micros-granular ends make a boundary tie measure-zero). Sessions merge
    * when an event lands within the 30-minute gap of the running session —
    * the same convention as the lag-based SQL sessionization. State is
    * per-user and watermark-evicted; the shuffle key (user_id) is the
    * natural partitioning at scale. Timestamps leave as epoch micros. */
  private def q98(s: SparkSession, d: String): DataFrame = {
    val sess = graft.streaming.EventsStream.readEventsDir(s, d)
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("user_id"), col("n"))
    graft.streaming.EventsStream.runToMemory(s, sess, "q98_sessions")
  }

  private val q98Sql =
    """WITH l AS (SELECT user_id, ts,
      |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |               > INTERVAL 30 MINUTE
      |             OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |             THEN 1 ELSE 0 END AS brk
      |      FROM events),
      |s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |        ROWS UNBOUNDED PRECEDING) AS sid FROM l),
      |g AS (SELECT user_id, sid, min(ts) AS st,
      |        max(ts) + INTERVAL 30 MINUTE AS en, count(*) AS n
      |      FROM s GROUP BY 1, 2),
      |mx AS (SELECT max(ts) AS max_ts FROM events)
      |SELECT epoch_us(st) AS start_us, epoch_us(en) AS end_us, user_id, n
      |FROM g, mx WHERE en <= max_ts - INTERVAL 1 DAY""".stripMargin

  /** q47: multimodal feature extraction — synthetic binary media (decode is
    * a documented stub; the Spark-side schema/batching/shape is real).
    * Output: per-kind feature aggregates. Oracle-checked EXACTLY: the stub
    * "signal" is md5-derived (first digest int, big-endian, as float32 over
    * Int.MaxValue), and DuckDB replays it bit-for-bit — md5 hex fold to
    * uint32, two's-complement to signed, REAL division forcing the same
    * float32 rounding the JVM produces (verified against a float32
    * simulation). The media table itself re-derives from its spec
    * (64 rows, kind = id mod 3) via range(64). */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(s, 64))
    feats.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(element_at(col("features"), 1)), 4).as("f0_avg"))
  }

  private val q47Sql =
    """WITH m AS (
      |  SELECT i, CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
      |              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    md5('payload-' || i) AS h
      |  FROM range(64) t(i)),
      |v AS (
      |  SELECT kind,
      |    list_reduce(list_transform(string_split(substr(h, 1, 8), ''),
      |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |      (a, c) -> a * 16 + c) AS u32
      |  FROM m),
      |f AS (
      |  SELECT kind,
      |    CAST(CASE WHEN u32 >= 2147483648 THEN u32 - 4294967296 ELSE u32 END
      |      AS REAL) / CAST(2147483647 AS REAL) AS f0
      |  FROM v)
      |SELECT kind, count(*) AS n, round(avg(f0), 4) AS f0_avg
      |FROM f GROUP BY kind""".stripMargin

  /** q48: language-ID over the documents corpus — prediction distribution
    * vs the synthetic label (the corpus is English-ish word salad, so this
    * exercises the operator shape, not linguistic accuracy). Oracle-checked:
    * the stopword-profile scores are integer-ratio doubles (exact in both
    * engines) and the argmax tiebreak (larger language code wins, matching
    * array_max over (score, lang) structs) is a CASE cascade in SQL. */
  private def q48(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), LangId.predict(col("text")).as("pred"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))

  private val q48Sql: String = {
    def lst(l: String) =
      LangId.profiles(l).map(w => s"'$w'").mkString("[", ", ", "]")
    val scores = LangId.profiles.keys.toSeq.sorted.map { l =>
      s"""CAST(len(list_filter(ws, w -> list_contains(${lst(l)}, w))) AS DOUBLE)
        |      / greatest(len(ws), 1) AS s_$l""".stripMargin
    }.mkString(",\n      |    ")
    // tiebreak: array_max over (score, lang) structs picks the larger lang
    // code on score ties → test languages in reverse-lexicographic order
    s"""WITH sc AS (SELECT lang,
      |    $scores
      |  FROM (SELECT lang, string_split(lower(text), ' ') AS ws FROM documents))
      |SELECT lang,
      |  CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
      |       WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
      |       WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
      |       WHEN s_en >= s_de THEN 'en'
      |       ELSE 'de' END AS pred,
      |  count(*) AS n
      |FROM sc GROUP BY 1, 2""".stripMargin
  }

  /** q50: bilateral trade volume (TPC-H Q7 shape): supplier nation ×
    * customer nation pairs, yearly revenue — two broadcast dim joins feeding
    * a fact join chain, group on (supp_nation, cust_nation, year). The
    * nation-set predicate is applied to the dims and PROPAGATED through the
    * dimension side of each join BEFORE the fact is touched: the filtered
    * nations shrink supplier/customer first (broadcast joins over tiny
    * inputs), the shrunken customer shrinks orders, and only then does
    * lineitem join — cut to the target nations' ~8% before the single
    * orderkey shuffle (AQE broadcasts the small slices at bench scale; at
    * cluster scale they shuffle, which is the safe choice). At 100 TB that
    * ordering is
    * the difference between shuffling every lineitem row and shuffling the
    * target slice; Spark's CBO join reorder is off by default, so the
    * DataFrame declaration order IS the join order for this chain. The
    * residual supp ≠ cust filter still needs both sides, so it stays
    * post-join. */
  private def q50(s: SparkSession, d: String): DataFrame = {
    val target = Seq("NATION_1", "NATION_2")
    val sn = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(target: _*))
    val cn = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"),
      col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(target: _*))
    // only the nation slices carry a broadcast hint (bounded at any scale);
    // the filtered supplier/customer/orders slices are left to AQE — tiny
    // here (AQE broadcasts them at runtime), but fact-proportional at
    // 100 TB where a forced broadcast would OOM
    val fs = Tables.supplier(s, d)
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val fc = Tables.customer(s, d)
      .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
      .select(col("c_custkey"), col("cust_nation"))
    val fo = Tables.orders(s, d)
      .join(fc, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    li(s, d)
      .join(fs, col("l_suppkey") === col("s_suppkey"))
      .join(fo, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("yr"))
      // integer-exact volume: prices are cent-exact and discounts
      // hundredth-exact in this data, so sum cents × (100 − disc%) as
      // LONGS and divide once at the end — float summation ORDER differs
      // between engines, and at the x10 replica the 10×-larger double sum
      // hit a last-cent rounding boundary (68204131.87 vs .86). Identical
      // integers divided identically are bit-equal at any scale.
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .cast("double") / 10000.0).as("volume"))
  }

  private val q50Sql =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INTEGER) AS yr,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |           * (100 - CAST(round(l_discount * 100) AS BIGINT)))
      |       AS DOUBLE) / 10000.0 AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      |  AND cn.n_name IN ('NATION_1', 'NATION_2')
      |  AND sn.n_name <> cn.n_name
      |GROUP BY 1, 2, 3""".stripMargin

  /** q51: pivot operator (wide conditional agg) — order counts by status per
    * year; the oracle expresses the same result as CASE-WHEN columns. */
  private def q51(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)

  private val q51Sql =
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |FROM orders GROUP BY 1""".stripMargin

  /** q67: the streaming sessionizer run as a real Structured Streaming
    * drain (file source → flatMapGroupsWithState → memory sink),
    * oracle-checked: with NoTimeout, an emitted session is exactly one
    * closed by data — every session except each user's last — which is
    * boundary-free in ANSI SQL (watermark-timeout closing is covered by
    * SessionStreamSpec instead; its ms-granular boundary can't be
    * reproduced exactly in SQL). Session times are epoch micros; total
    * value is excluded on purpose: min/max/count are accumulation-order-
    * exact, double sums are not. */
  private def q67(s: SparkSession, d: String): DataFrame = {
    val streaming = graft.streaming.SessionStream.sessions(s,
      graft.streaming.EventsStream.readEventsDir(s, d))
      .toDF()
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
    graft.streaming.EventsStream.runToMemory(s, streaming, "q67_sessions")
  }

  private val q67Sql =
    """WITH o AS (SELECT user_id, event_id, ts,
      |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |           FROM events),
      |s AS (SELECT user_id, ts,
      |        sum(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
      |            THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM o),
      |agg AS (SELECT user_id, sid, epoch_us(min(ts)) AS start_us,
      |          epoch_us(max(ts)) AS end_us, count(*) AS n_events
      |        FROM s GROUP BY 1, 2)
      |SELECT user_id, start_us, end_us, n_events
      |FROM (SELECT a.*, max(sid) OVER (PARTITION BY user_id) AS max_sid
      |      FROM agg a)
      |WHERE sid < max_sid""".stripMargin

  /** q115: stream-STATIC enrichment join — the events stream joins a
    * broadcast static dimension (customer → nation) row-by-row as batches
    * arrive, then aggregates per nation; drained in complete mode, the
    * memory sink's final table must equal the batch join+agg (the oracle).
    * This is the remaining streaming-join surface next to q88's
    * stream-stream interval join: no watermark needed on the static side,
    * no state beyond the running agg, and the dim broadcast is rebuilt per
    * micro-batch (so slowly-changing dims pick up changes between
    * batches). At scale the stream side never shuffles for the join —
    * only the (nation-keyed) agg exchanges. */
  private def q115(s: SparkSession, d: String): DataFrame = {
    val dim = graft.Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val enriched = graft.streaming.EventsStream.readEventsDir(s, d)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    graft.streaming.EventsStream.runToMemory(s, enriched, "q115_enrich",
      outputMode = "complete")
  }

  private val q115Sql =
    """SELECT c_nationkey, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_nationkey""".stripMargin

  /** q118: watermark-TTL'd streaming dedup — `dropDuplicatesWithinWatermark`
    * (the API `dropDuplicates` at scale actually needs: plain streaming
    * dedup state grows FOREVER on an unbounded id space; this one evicts an
    * id's state once the watermark passes it, bounding state by the
    * watermark horizon × arrival rate). The corpus's duplicate event_ids
    * are exact replays inside the horizon, so the drained first-occurrence
    * set must equal batch DISTINCT — per-type row counts and distinct-id
    * counts pinned by the oracle (n == n_ids also proves no duplicate
    * survived the drain). Fourth ST4 surface next to q25 (batch first-pick),
    * q76 (dropDuplicates), and the stateful curation stream. */
  private def q118(s: SparkSession, d: String): DataFrame = {
    val deduped = graft.streaming.EventsStream.readEventsDir(s, d)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
    graft.streaming.EventsStream.runToMemory(s, deduped, "q118_dedup")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_ids"))
  }

  private val q118Sql =
    """SELECT event_type, count(DISTINCT event_id) AS n,
      |       count(DISTINCT event_id) AS n_ids
      |FROM events GROUP BY event_type""".stripMargin

  /** q138: STREAMING heavy hitters — q131's Misra-Gries Aggregator run as a
    * streaming GLOBAL aggregate: per micro-batch the UDAF partials combine
    * map-side, one O(k) buffer lives in the state store, and the
    * complete-mode drain emits the final sketch. k=4 under 5 event types
    * forces the decrement path through the streaming state. The drained
    * sketch is judged against exact batch counts under the q131 contract —
    * sound here because MG's guarantees (presence above n/(k+1), no
    * overestimate, bounded undercount) hold under ANY partial/merge order,
    * including the micro-batch order of a streaming drain; n_heavy and the
    * totals are exact on both engines.
    *
    * The events are re-staged as three single-file slices and streamed with
    * maxFilesPerTrigger=1 so the drain runs ≥3 micro-batches — each batch
    * MERGES its partial into the state-store buffer, exercising the
    * cross-batch state path a one-file (one-batch) source would skip. */
  private def q138(s: SparkSession, d: String): DataFrame = {
    val k = 4
    val mg = udaf(graft.functions.HeavyHitters(k))
    // one scan stages the three slices (range-partitioned on event_id%3 —
    // three deterministic part files, each its own micro-batch below)
    val base = java.nio.file.Files.createTempDirectory("hh_stream")
    val dir = base.resolve("events").toString
    // the drain is EAGER (processAllAvailable + stop; the memory sink holds
    // the rows) — unlike q111/q132 nothing reads the staged files after the
    // try block, so reclaim them now rather than at JVM exit; the finally
    // covers a throwing stage/drain too (no leaked tree on failure)
    val drained =
      try {
        Tables.events(s, d)
          .select(col("event_type"), pmod(col("event_id"), lit(3)).as("slice"))
          .repartitionByRange(3, col("slice"))
          .select(col("event_type"))
          .write.parquet(dir)
        val stream = s.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType))))
          .option("maxFilesPerTrigger", "1")
          .parquet(dir)
        graft.streaming.EventsStream.runToMemory(s,
          stream.agg(mg(col("event_type")).as("hh")), "q138_hh", "complete")
      } finally graft.TempDirs.rmTree(base)
    val sketch = drained.select(explode(col("hh")).as(Seq("w", "est")))
    val exact = Tables.events(s, d)
      .groupBy(col("event_type").as("w")).agg(count(lit(1)).as("cnt"))
    SketchContract.misraGries(sketch, exact, k,
      distinctName = "n_types", totalName = "n_events")
  }

  private val q138Sql =
    """WITH c AS (SELECT event_type AS w, count(*) AS cnt FROM events GROUP BY 1),
      |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_events FROM c)
      |SELECT count(*) AS n_types, s.n_events,
      |  CAST(sum(CASE WHEN cnt > s.n_events // 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_heavy,
      |  TRUE AS all_heavy_present, TRUE AS never_overestimates,
      |  TRUE AS within_bound
      |FROM c, s GROUP BY s.n_events""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q27_sessionize", q27, Some(q27Sql), bench = true),
    QueryDef("q28_stats_agg", q28, Some(q28Sql)),
    QueryDef("q29_json_extract", q29, Some(q29Sql)),
    QueryDef("q44_approx_distinct", q44, Some(q44Sql)),
    QueryDef("q45_embedding_neardup", q45, Some(q45Sql)),
    QueryDef("q84_embedding_neardup_lsh", q84, Some(q45Sql)),
    QueryDef("q136_semantic_survivors", q136, Some(q136Sql)),
    QueryDef("q46_fts_postings", q46, Some(q46Sql)),
    // binary-digest features (not SQL-portable) — rows-only in the driver
    // gate; value-pinned by its portable sibling q75 (oracle-green)
    QueryDef("q47_media_features", q47, Some(q47Sql)),
    QueryDef("q48_langid", q48, Some(q48Sql)),
    QueryDef("q49_above_part_avg", q49, Some(q49Sql)),
    QueryDef("q50_trade_volume", q50, Some(q50Sql), bench = true),
    QueryDef("q51_status_pivot", q51, Some(q51Sql)),
    QueryDef("q67_stream_sessions", q67, Some(q67Sql)),
    QueryDef("q138_stream_heavy_hitters", q138, Some(q138Sql)),
    QueryDef("q70_binary_digest", q70, Some(q70Sql)),
    QueryDef("q71_lake_roundtrip", q71, Some(q71Sql)),
    QueryDef("q166_orc_roundtrip", q166, Some(q166Sql)),
    QueryDef("q75_media_extract", q75, Some(q75Sql)),
    QueryDef("q76_stream_hourly", q76, Some(q76Sql)),
    QueryDef("q88_stream_attribution", q88, Some(q88Sql)),
    QueryDef("q98_stream_session_window", q98, Some(q98Sql)),
    QueryDef("q101_sketch_merge", q101, Some(q101Sql)),
    QueryDef("q155_overlap_sketch", q155, Some(q155Sql)),
    QueryDef("q115_stream_enrich", q115, Some(q115Sql)),
    QueryDef("q118_stream_dedup_ttl", q118, Some(q118Sql)))
}
