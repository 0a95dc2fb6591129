package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + dedup operator inventory over the `documents` corpus
  * (north-star training-data ops: token counting, quality scoring,
  * fingerprinting, word frequency, exact/near dedup).
  */
object TextQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** q30: token statistics per language — tokenization stays inside
    * whole-stage codegen (split+size), agg is map-side combinable. */
  private def q30(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("lang"), tokenCount(col("text")).as("toks"))
      .groupBy(col("lang"))
      .agg(sum(col("toks")).cast("long").as("total_tokens"),
        count(lit(1)).as("n_docs"),
        round(avg(col("toks")), 4).as("avg_tokens"))

  private val q30Sql =
    """SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  count(*) AS n_docs, round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
      |FROM documents GROUP BY lang""".stripMargin

  /** q31: corpus word frequency top-20 (L13 full-text-search postings
    * shape: explode → count → top-k with unique tiebreak). */
  private def q31(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(explode(words(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(20)

  private val q31Sql =
    """SELECT word, count(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY freq DESC, word LIMIT 20""".stripMargin

  /** q32: per-document fingerprints — exact content hash + order-insensitive
    * shingle-set hash (document fingerprinting for dedup indexes). */
  private def q32(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      contentFingerprint(col("text")).as("fp"),
      shingleFingerprint(col("text")).as("sfp"))

  private val q32Sql =
    """SELECT doc_id, md5(text) AS fp,
      |  md5(array_to_string(list_sort(list_distinct(
      |    CASE WHEN len(string_split(text,' ')) >= 3
      |         THEN list_transform(generate_series(1, len(string_split(text,' ')) - 2),
      |                i -> string_split(text,' ')[i] || ' ' ||
      |                     string_split(text,' ')[i+1] || ' ' ||
      |                     string_split(text,' ')[i+2])
      |         ELSE [] END)), ' ')) AS sfp
      |FROM documents""".stripMargin

  /** q33: quality scoring — token count, mean token length, stopword ratio
    * (integer-ratio doubles: bit-identical across engines). */
  private def q33(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      round(meanTokenLen(col("text")), 4).as("mean_tok_len"),
      round(stopwordRatio(col("text")), 4).as("stop_ratio"))

  private val q33Sql =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |  round(CAST(list_sum(list_transform(string_split(text,' '), w -> length(w))) AS DOUBLE)
      |        / len(string_split(text,' ')), 4) AS mean_tok_len,
      |  round(CAST(len(list_filter(string_split(text,' '),
      |          w -> list_contains(['the','a','of','and','to','in'], w))) AS DOUBLE)
      |        / len(string_split(text,' ')), 4) AS stop_ratio
      |FROM documents""".stripMargin

  private val dupPairsSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(
      |    CASE WHEN len(ws) >= 3
      |         THEN list_transform(generate_series(1, len(ws) - 2),
      |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |         ELSE [] END) AS sg FROM w),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
      |        CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |          / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS j
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT round(j, 4) AS jr, da, db FROM p WHERE j >= 0.5""".stripMargin

  /** q34: brute-force near-dup pairs (oracle baseline, O(n²)). */
  private def q34(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(docs(s, d), n = 3, threshold = 0.5)

  /** q35: MinHash-LSH near-dup pairs with exact verification — the 100 TB
    * path; verified output equals the brute-force oracle (see Dedup). */
  private def q35(s: SparkSession, d: String): DataFrame =
    Dedup.minhashDupPairs(docs(s, d), n = 3, numHashes = 32,
      rowsPerBand = 2, threshold = 0.5)

  /** q174: MinHash-LSH near-dup pairs through the HOT-BUCKET-CAPPED
    * candidate path ([[Dedup.minhashDupPairsCapped]]) — the 100 TB guard
    * against boilerplate clusters blowing a band bucket up quadratically
    * (the ×100 rehearsal's 470 M-pair q35 shape). The cap is ACTIVE
    * (maxBucket = 64) but no gate-corpus bucket exceeds it, so the output
    * equals the uncapped pipeline and the same brute-force oracle pins it;
    * the hot-bucket semantics (fingerprint pre-collapse + star + capped
    * rep pairs, bounded emission) are property-tested with planted hot
    * buckets in PropertySpec. */
  private def q174(s: SparkSession, d: String): DataFrame =
    Dedup.minhashDupPairsCapped(docs(s, d), n = 3, numHashes = 32,
      rowsPerBand = 2, threshold = 0.5, maxBucket = 64)

  /** q89: near-dup pairs → connected components → survivor groups
    * ([[Dedup.dupComponents]]: iterative min-label propagation — the dedup
    * DECISION step). Oracle: DuckDB recursive-CTE transitive closure over
    * the same verified pair set; the corpus plants a 3-member chain, so
    * transitivity (not just pair mirroring) is exercised. */
  private def q89(s: SparkSession, d: String): DataFrame =
    Dedup.dupGroups(Dedup.minhashDupPairs(docs(s, d), n = 3, numHashes = 32,
      rowsPerBand = 2, threshold = 0.5))

  private val q89Sql =
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(
      |    CASE WHEN len(ws) >= 3
      |         THEN list_transform(generate_series(1, len(ws) - 2),
      |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |         ELSE [] END) AS sg FROM w),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
      |        CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |          / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS j
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |d AS (SELECT da, db FROM p WHERE j >= 0.5),
      |e AS (SELECT da AS a, db AS b FROM d UNION SELECT db, da FROM d),
      |r AS (SELECT a, b FROM e
      |      UNION
      |      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
      |lab AS (SELECT a AS v, least(a, min(b)) AS comp FROM r GROUP BY a)
      |SELECT comp AS component, count(*) AS n_docs,
      |  array_to_string(list_sort(list(v)), ',') AS members
      |FROM lab GROUP BY comp""".stripMargin

  /** q135: word-level containment dedup ([[Dedup.containmentPairs]]) — the
    * exact-substring family: truncated re-crawls / quote-wrapped mirrors
    * whose whole word sequence survives inside a longer doc. The oracle is
    * the O(n²) all-pairs substring scan; the engine runs the exact
    * first-n-gram candidate join (no recall loss, see the operator doc) and
    * the hash match proves the two agree. */
  private def q135(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(docs(s, d), n = 5)

  private val q135Sql =
    """WITH t AS (SELECT doc_id, text FROM documents
      |           WHERE len(string_split(text, ' ')) >= 5)
      |SELECT a.doc_id AS contained, b.doc_id AS container
      |FROM t a JOIN t b ON a.doc_id != b.doc_id
      |WHERE contains(' ' || b.text || ' ', ' ' || a.text || ' ')
      |  AND (length(b.text) > length(a.text)
      |       OR (length(b.text) = length(a.text) AND b.doc_id < a.doc_id))""".stripMargin

  /** q137: dedup survivor corpus — the END of the dedup pipeline: near-dup
    * pairs (q35 scale path) → components (q89) → every non-survivor member
    * anti-joined OUT of the corpus, reported per source as kept/dropped doc
    * and kept-token counts. The anti-join is keyed on doc_id (uniform);
    * the non-survivor set is component-bounded (≤ one row per duplicated
    * doc), so at 100 TB it is the small side and broadcasts — pruning the
    * corpus costs one scan plus a dim-sized join, not a fact shuffle. */
  private def q137(s: SparkSession, d: String): DataFrame =
    // literally q35's pair pipeline — reusing the def keeps the two from
    // drifting if the LSH parameters are ever tuned
    survivorReport(docs(s, d), q35(s, d))

  /** Shared q137/q178 tail: pairs → components → per-source kept/dropped
    * report (the non-survivor set is component-bounded, so it broadcasts
    * at any corpus size — pruning costs one scan + a dim join). */
  private def survivorReport(all: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = Dedup.dupComponents(pairs.select(col("da"), col("db")))
    val dropped = comps.filter(col("v") =!= col("comp"))
      .select(col("v").as("doc_id"))
    val flagged = all.join(broadcast(dropped.withColumn("is_dup", lit(1))),
      Seq("doc_id"), "left")
    flagged.groupBy(col("source"))
      .agg(count(when(col("is_dup").isNull, 1)).as("n_kept"),
        count(col("is_dup")).as("n_dropped"),
        sum(when(col("is_dup").isNull, tokenCount(col("text")))
          .otherwise(0L)).cast("long").as("kept_tokens"))
  }

  /** q178: the dedup DECISION path end-to-end through the hot-bucket CAP —
    * q137's survivor corpus with q174's capped pair stage feeding the
    * components. Round 8 capped pair GENERATION (q174/q175/q177); this
    * gates what a 100 TB pipeline actually ships: the per-source
    * kept/dropped decision derived from capped pairs. On the gate corpus
    * no bucket exceeds maxBucket, so the report equals q137's under the
    * same oracle; on a boilerplate corpus the capped star links keep every
    * collapsed member attached to its component (PropertySpec's planted
    * hot-bucket invariant: capped components == uncapped), so the DECISION
    * survives the cap even where pair enumeration is bounded. */
  private def q178(s: SparkSession, d: String): DataFrame =
    survivorReport(docs(s, d), q174(s, d))

  private val q137Sql =
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(
      |    CASE WHEN len(ws) >= 3
      |         THEN list_transform(generate_series(1, len(ws) - 2),
      |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |         ELSE [] END) AS sg FROM w),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
      |        CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |          / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS j
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |d AS (SELECT da, db FROM p WHERE j >= 0.5),
      |e AS (SELECT da AS a, db AS b FROM d UNION SELECT db, da FROM d),
      |r AS (SELECT a, b FROM e
      |      UNION
      |      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
      |lab AS (SELECT a AS v, least(a, min(b)) AS comp FROM r GROUP BY a),
      |dr AS (SELECT v AS doc_id FROM lab WHERE v != comp)
      |SELECT d.source,
      |  count(CASE WHEN dr.doc_id IS NULL THEN 1 END) AS n_kept,
      |  count(dr.doc_id) AS n_dropped,
      |  CAST(sum(CASE WHEN dr.doc_id IS NULL
      |       THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM documents d LEFT JOIN dr ON d.doc_id = dr.doc_id
      |GROUP BY d.source""".stripMargin

  /** q142: survivor PICKING policy — q137 keeps each component's min
    * doc_id; real pipelines keep the BEST member (longest, highest quality:
    * a truncated mirror should lose to its source). Per component, the
    * survivor is argmax (n_chars, doc_id) via a component-partitioned
    * window — components are near-cliques and small, so the window
    * partitions are bounded; no global sort. */
  private def q142(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = Dedup.dupComponents(q35(s, d).select(col("da"), col("db")))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("n_chars").desc, col("v"))
    comps.join(docs(s, d).select(col("doc_id").as("v"), col("n_chars")), "v")
      .withColumn("rk", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("comp"))))
      .filter(col("rk") === 1)
      .select(col("comp").as("component"), col("v").as("survivor"),
        col("n_chars").as("survivor_chars"), col("n_docs"))
  }

  private val q142Sql =
    """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT doc_id, list_distinct(
      |    CASE WHEN len(ws) >= 3
      |         THEN list_transform(generate_series(1, len(ws) - 2),
      |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |         ELSE [] END) AS sg FROM w),
      |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
      |        CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |          / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS j
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
      |d AS (SELECT da, db FROM p WHERE j >= 0.5),
      |e AS (SELECT da AS a, db AS b FROM d UNION SELECT db, da FROM d),
      |r AS (SELECT a, b FROM e
      |      UNION
      |      SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
      |lab AS (SELECT a AS v, least(a, min(b)) AS comp FROM r GROUP BY a),
      |sel AS (SELECT lab.comp, lab.v, doc.n_chars,
      |          row_number() OVER (PARTITION BY lab.comp
      |            ORDER BY doc.n_chars DESC, lab.v) AS rk,
      |          count(*) OVER (PARTITION BY lab.comp) AS n_docs
      |        FROM lab JOIN documents doc ON lab.v = doc.doc_id)
      |SELECT comp AS component, v AS survivor, n_chars AS survivor_chars,
      |  n_docs
      |FROM sel WHERE rk = 1""".stripMargin

  /** q36: SimHash near-dup pairs (hamming ≤ 3 via 16-bit banding) on the
    * ENGINE hash (xxhash64 — the scale configuration; q69 runs the
    * identical pipeline on the portable hash with a full value oracle).
    * xxhash64 isn't reproducible in DuckDB, so the oracle checks the
    * operator's DETECTION GUARANTEE instead: 50 docs are re-crawled under
    * shifted ids (+100000) with identical text — identical text ⇒
    * identical word multiset ⇒ identical simhash ⇒ all chunks collide ⇒
    * the pair MUST surface with hamming 0, under any hash function. The
    * query emits exactly those injected pairs (db − da = 100000 can hold
    * for no other pair: original ids < 100000 and injected-injected gaps
    * are < 100000), so DuckDB enumerates the full expected result —
    * a missed pair (recall bug), phantom pair, or nonzero hamming all
    * hash-mismatch. Organic near-dup discovery stays covered by q69. */
  private def q36(s: SparkSession, d: String): DataFrame = {
    val d0 = docs(s, d)
    val recrawl = d0.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 100000L)
    Dedup.simhashDupPairs(d0.unionByName(recrawl),
        maxHamming = 3, numChunks = 4)
      .filter(col("db") - col("da") === 100000L)
      .select(col("da"), col("db"), col("hamming").cast("int").as("hamming"))
  }

  private val q36Sql =
    """SELECT doc_id AS da, doc_id + 100000 AS db, CAST(0 AS INTEGER) AS hamming
      |FROM documents WHERE doc_id < 50""".stripMargin

  /** q65: TF-IDF (the IR-classic two-level aggregation): term frequency
    * per (doc, word), document frequency per word, corpus size broadcast
    * in as a one-row cross join — no driver-side collect in the lineage.
    *
    * Round-9 shape (×10 yardstick find — the string form read 3.2×
    * DuckDB): only the REQUESTED docs (doc_id < 10, pushed to the scan)
    * ever touch word strings; the corpus-wide document-frequency side
    * runs entirely in HASH space — native in-place gram hashing
    * ([[graft.functions.WordNgramHashes]] n=1) deduped PER DOC inside
    * the row (`array_distinct` on the long array), so document frequency
    * is a plain combinable count and no corpus shuffle ever carries a
    * string or a two-phase distinct (the crossDocDupCounts recipe;
    * byte-identical modulo 2^-64 collisions, oracle-pinned — the
    * (wh, doc_id) countDistinct form measured 11.2 s at ×100 vs this
    * form's number in PERF.md r9). The tiny tf side then joins df on
    * the word hash — broadcast by size. */
  private def q65(s: SparkSession, d: String): DataFrame = {
    val tf = docs(s, d)
      .filter(col("doc_id") < 10)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("wh", xxhash64(col("word")))
    val dfreq = docs(s, d)
      .select(explode(array_distinct(
        graft.functions.WordNgramHashes(col("text"), 1))).as("wh"))
      .groupBy(col("wh"))
      .agg(count(lit(1)).as("df"))
    val n = docs(s, d).agg(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(dfreq, "wh").crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"), col("tf"),
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 4)
          .as("tfidf"))
  }

  private val q65Sql =
    """WITH tf AS (SELECT doc_id, word, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents)
      |  GROUP BY 1, 2),
      |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
      |SELECT t.doc_id, t.word, t.tf,
      |  round(CAST(t.tf AS DOUBLE) *
      |        ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)), 4) AS tfidf
      |FROM tf t JOIN dfreq d USING (word) CROSS JOIN n
      |WHERE t.doc_id < 10""".stripMargin

  /** q69: the SimHash dedup pipeline under the oracle gate — same banding/
    * verify machinery as q36 but with the cross-engine-reproducible 31-bit
    * polynomial word hash, so DuckDB reproduces the simhashes bit-for-bit
    * (votes → sign bits → 8-bit chunk banding → hamming verify). */
  private def q69(s: SparkSession, d: String): DataFrame =
    Dedup.simhashDupPairs(docs(s, d), maxHamming = 3, numChunks = 4,
        wordHash = Dedup.portableWordHash, numBits = 31)
      .select(col("da"), col("db"), col("hamming").cast("int").as("hamming"))

  private val q69Sql: String = {
    val votes = (0 until 31)
      .map(b => s"sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n      |          ")
    val rebuild = (0 until 31)
      .map(b => s"(CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
      .mkString(" +\n      |          ")
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |h AS (SELECT doc_id,
      |        list_reduce(list_transform(string_split(word, ''),
      |          c -> CAST(ascii(c) AS BIGINT)),
      |          (a, c) -> (a * 31 + c) % 2147483647) AS hv
      |      FROM w),
      |v AS (SELECT doc_id,
      |          $votes
      |      FROM h GROUP BY doc_id),
      |s AS (SELECT doc_id,
      |          $rebuild AS sh
      |      FROM v),
      |cb AS (SELECT doc_id, sh, chunk, (sh >> (chunk * 8)) & 255 AS cv
      |       FROM s, (SELECT unnest([0, 1, 2, 3]) AS chunk)),
      |cand AS (SELECT DISTINCT a.doc_id AS da, a.sh AS ha,
      |                b.doc_id AS db, b.sh AS hb
      |         FROM cb a JOIN cb b
      |           ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id)
      |SELECT da, db, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 3""".stripMargin
  }

  /** BPE-style pretokenizer regex (GPT-2-shaped, simplified to the subset
    * both Java regex and RE2 support — no lookaround): contraction tails,
    * space-prefixed letter runs, digit runs, punctuation runs. */
  private val bpeIshPattern = "'(?:ll|ve|re|[sdmt])| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+"

  /** q74: token counting both ways the north star asks for — whitespace
    * split and a BPE-ish pretokenizer regex — per document, plus the
    * ratio's numerator/denominator kept exact (ints). */
  private def q74(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"),
      tokenCount(col("text")).as("n_ws"),
      size(regexp_extract_all(col("text"), lit(bpeIshPattern), lit(0)))
        .as("n_bpe"))

  private val q74Sql = {
    val sqlPat = bpeIshPattern.replace("'", "''")
    s"""SELECT doc_id, len(string_split(text, ' ')) AS n_ws,
      |  len(regexp_extract_all(text, '$sqlPat')) AS n_bpe
      |FROM documents""".stripMargin
  }

  /** q127: conjunctive (AND) full-text query over the positional postings
    * index ([[Fts.conjunctiveQuery]]) — docs containing ALL query terms
    * with summed tf. The index-backed query half of q46's index build
    * (reference keeps FTS tables in Chroma's sqlite:
    * scripts/vector_db/chroma.sqlite3 `embedding_fulltext_search*`). */
  private def q127(s: SparkSession, d: String): DataFrame =
    Fts.conjunctiveQuery(
      Fts.positionalPostings(docs(s, d), "doc_id", "text"),
      Seq("table", "join", "scan"))

  private val q127Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word
      |             FROM documents)
      |SELECT doc_id, count(*) AS total_tf FROM tok
      |WHERE word IN ('table','join','scan')
      |GROUP BY doc_id HAVING count(DISTINCT word) = 3""".stripMargin

  /** q128: phrase query over the positional postings index
    * ([[Fts.phraseQuery]]): docs where "big order scan" occurs at
    * consecutive positions, with occurrence counts. The oracle replays the
    * same slot-shift algebra relationally (positions shifted by slot →
    * a start position present in every slot is a phrase hit). */
  private def q128(s: SparkSession, d: String): DataFrame =
    Fts.phraseQuery(
      Fts.positionalPostings(docs(s, d), "doc_id", "text"),
      Seq("big", "order", "scan"))

  private val q128Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word,
      |    generate_subscripts(string_split(text,' '),1) - 1 AS pos
      |  FROM documents),
      |slots(word, slot) AS (VALUES ('big',0),('order',1),('scan',2)),
      |m AS (SELECT t.doc_id, s.slot, t.pos - s.slot AS start
      |      FROM tok t JOIN slots s ON t.word = s.word),
      |starts AS (SELECT doc_id, start FROM m GROUP BY doc_id, start
      |           HAVING count(DISTINCT slot) = 3)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
      |FROM starts GROUP BY doc_id""".stripMargin

  /** q129: BM25 top-10 over the FTS index ([[Fts.bm25Scores]], k1=1.2
    * b=0.75, Lucene idf) — the full lexical ranker the AND/phrase operators
    * build toward; the oracle recomputes every component (df, N, avgdl, tf,
    * doc_len) from scratch and must match the fixed-order per-term double
    * fold to 4 decimals. */
  private def q129(s: SparkSession, d: String): DataFrame = {
    val d0 = docs(s, d)
    Fts.bm25Scores(
        Fts.positionalPostings(d0, "doc_id", "text"),
        Fts.docLengths(d0, "doc_id", "text"),
        Seq("table", "join", "scan"))
      .select(col("doc_id"), round(col("bm25"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)
  }

  private val q129Sql =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word
      |             FROM documents),
      |p AS (SELECT word, doc_id, count(*) AS tf FROM tok
      |      WHERE word IN ('join','scan','table') GROUP BY 1,2),
      |dft AS (SELECT word, count(*) AS df FROM p GROUP BY 1),
      |dl AS (SELECT doc_id, len(string_split(text,' ')) AS doc_len
      |       FROM documents),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avgdl
      |       FROM dl),
      |sc AS (SELECT p.doc_id, p.word,
      |    ln((st.n_docs - dft.df + 0.5)/(dft.df + 0.5) + 1)
      |      * (p.tf * 2.2)
      |      / (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.doc_len / st.avgdl)) AS score
      |  FROM p JOIN dft USING (word) JOIN dl USING (doc_id), st)
      |SELECT doc_id,
      |  round(coalesce(sum(CASE WHEN word='join' THEN score END), 0)
      |      + coalesce(sum(CASE WHEN word='scan' THEN score END), 0)
      |      + coalesce(sum(CASE WHEN word='table' THEN score END), 0), 4) AS bm25
      |FROM sc GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin

  /** q131: Misra-Gries heavy hitters — the k-counter one-pass sketch
    * ([[graft.functions.HeavyHitters]]) vs exact word counts, as a q44/q109
    * contract: every word with true count > n/(k+1) must be present, no
    * estimate exceeds truth, every undercount is ≤ n/(k+1). `n_heavy` is
    * exact on both engines — a real value check, not just the booleans.
    * The sketch aggregates with O(k) state per partial; the exact counts
    * here exist only to judge it. */
  private def q131(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val mg = udaf(graft.functions.HeavyHitters(k))
    val toks = docs(s, d).select(explode(words(col("text"))).as("w"))
    val sketch = toks.agg(mg(col("w")).as("hh"))
      .select(explode(col("hh")).as(Seq("w", "est"))) // ≤ k rows
    val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    SketchContract.misraGries(sketch, exact, k,
      distinctName = "n_distinct", totalName = "n_tokens")
  }

  private val q131Sql =
    """WITH t AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
      |c AS (SELECT w, count(*) AS cnt FROM t GROUP BY w),
      |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens FROM c)
      |SELECT count(*) AS n_distinct, s.n_tokens,
      |  CAST(sum(CASE WHEN cnt > s.n_tokens // 65 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_heavy,
      |  TRUE AS all_heavy_present, TRUE AS never_overestimates,
      |  TRUE AS within_bound
      |FROM c, s GROUP BY s.n_tokens""".stripMargin

  /** q132: FTS index upsert ROUND TRIP (q71's sink-roundtrip pattern for
    * the postings index): bulk-build the term-bucketed index from a v1
    * crawl (docs with id%5 ≠ 2), then upsert a batch that both ADDS the
    * id%5 == 2 docs and RE-CRAWLS the id%5 == 1 docs with revised text,
    * then answer from the pruned index ([[Fts.loadPostings]]). The oracle
    * computes the same postings directly from the FINAL corpus — proving
    * stale postings died in their old buckets and the pruned read is
    * complete. Positions are comma-joined for a portable compare. */
  private def q132(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("table", "join", "scan")
    val all = docs(s, d)
    val v1 = all.filter(col("doc_id") % 5 =!= 2)
    val batch = all.filter(col("doc_id") % 5 === 2)
      .unionByName(all.filter(col("doc_id") % 5 === 1)
        .withColumn("text", concat(col("text"), lit(" rev2 table"))))
    // the index must outlive this method (the returned frame reads it
    // lazily) — reclaimed at JVM exit, like q111's dim tree
    val base = graft.TempDirs.scratchAtExit("fts_rt")
    val idx = base.resolve("postings").toString
    Fts.writePostingsIndex(
      Fts.positionalPostings(v1, "doc_id", "text"), idx, nBuckets = 16)
    Fts.upsertPostingsIndex(batch, idx, "doc_id", "text", nBuckets = 16)
    Fts.loadPostings(s, idx, terms, nBuckets = 16)
      .filter(col("word").isin(terms: _*))
      .select(col("word"), col("doc_id"), col("tf"),
        array_join(transform(col("positions"), p => p.cast("string")), ",")
          .as("positions"))
  }

  private val q132Sql =
    """WITH final AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 1 THEN text || ' rev2 table' ELSE text END
      |      AS text
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS word,
      |    generate_subscripts(string_split(text,' '),1) - 1 AS pos
      |  FROM final)
      |SELECT word, doc_id, count(*) AS tf,
      |  array_to_string(list_sort(list(pos)), ',') AS positions
      |FROM tok WHERE word IN ('table','join','scan')
      |GROUP BY word, doc_id""".stripMargin

  /** Per-JVM memoized persisted postings index over a corpus dir — the
    * SERVING-side fixture q181 probes. The round-9 verdict's q128 finding:
    * the inline-build phrase query re-derives the whole corpus's postings
    * per query (build cost ∝ corpus — that work belongs with the
    * build-cost queries, q46), while the deployed shape the reference
    * itself runs (Chroma's `embedding_fulltext_search*` tables in
    * `scripts/vector_db/chroma.sqlite3`) maintains the FTS index ONCE and
    * serves every query from it. Memoizing per (corpus dir) makes the
    * amortization explicit: first caller builds under a JVM-exit-scoped
    * scratch dir, every later query probes — exactly how the streaming
    * ingest loop (q160) + probe pair deploys at 100 TB. */
  private object ServedPostings {
    val nBuckets = 64
    private val built = scala.collection.mutable.Map.empty[(String, String), String]
    // The memo keys on (dir, corpus fingerprint), not the dir string alone:
    // a corpus dir regenerated IN PLACE mid-JVM (a replica rebuild between
    // two q181 executions) must trigger a rebuild, or q181 serves stale
    // postings while the oracle recomputes from the new files (round-10
    // ADVICE). The fingerprint is the parquet files' (name, size, mtime) —
    // cheap directory metadata, no data read.
    private def fingerprint(d: String): String = {
      val f = new java.io.File(d, "documents.parquet")
      val files =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq
            .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        else Seq(f)
      files.map(p => s"${p.getName}:${p.length}:${p.lastModified}")
        .mkString(";")
    }
    def indexFor(s: SparkSession, d: String): String = synchronized {
      built.getOrElseUpdate((d, fingerprint(d)), {
        val idx = graft.TempDirs.scratchAtExit("fts_served")
          .resolve("postings").toString
        Fts.writePostingsIndex(
          Fts.positionalPostings(docs(s, d), "doc_id", "text"),
          idx, nBuckets = nBuckets)
        idx
      })
    }
  }

  /** q181: phrase query SERVED from the persisted term-bucketed postings
    * index ([[Fts.loadPostings]] → [[Fts.phraseQuery]]) — q128's answer,
    * q132's deployed-index shape. The scan reads ONLY the phrase terms'
    * hash-bucket partitions (partition pruning at the file index, before
    * any data is read) and the phrase's slot-shift intersection runs over
    * those postings alone, so query cost ∝ the three terms' posting
    * lists, never the corpus. The oracle recomputes the phrase from the
    * raw corpus — proving the index-served answer complete. */
  private def q181(s: SparkSession, d: String): DataFrame = {
    val phrase = Seq("big", "order", "scan")
    Fts.phraseQuery(
      Fts.loadPostings(s, ServedPostings.indexFor(s, d), phrase,
        nBuckets = ServedPostings.nBuckets),
      phrase)
  }

  /** q160: streaming FTS INGEST — the postings index maintained from a
    * Structured Streaming foreachBatch drain (the q145/q154 loop shape
    * applied to the inverted index, completing streaming maintenance
    * across all index families): slice 0 bulk-builds most of the corpus
    * including the %5==1 docs' ORIGINAL text, slice 1 appends the
    * %5==2 docs, slice 2 RE-CRAWLS the %5==1 docs with changed text —
    * so one drain exercises empty-dir routing, append merge, and the
    * stale-postings kill in their old term buckets, against live
    * checkpointed state. Final pruned read == q132's round trip, so its
    * final-corpus oracle applies verbatim. */
  private def q160(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("table", "join", "scan")
    val all = docs(s, d).select(col("doc_id"), col("text"))
    val base = graft.TempDirs.scratchAtExit("stream_fts")
    val idx = base.resolve("postings").toString
    graft.streaming.IngestHarness.drain(s, base, Seq(
        all.filter(col("doc_id") % 5 =!= 2),
        all.filter(col("doc_id") % 5 === 2),
        all.filter(col("doc_id") % 5 === 1)
          .withColumn("text", concat(col("text"), lit(" rev2 table")))),
      batch => Fts.upsertPostingsIndex(batch, idx, "doc_id", "text",
        nBuckets = 16))
    Fts.loadPostings(s, idx, terms, nBuckets = 16)
      .filter(col("word").isin(terms: _*))
      .select(col("word"), col("doc_id"), col("tf"),
        array_join(transform(col("positions"), p => p.cast("string")), ",")
          .as("positions"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q30_token_stats", q30, Some(q30Sql), bench = true),
    QueryDef("q31_word_freq", q31, Some(q31Sql), bench = true),
    QueryDef("q32_fingerprints", q32, Some(q32Sql)),
    QueryDef("q33_quality_score", q33, Some(q33Sql)),
    QueryDef("q34_jaccard_dupes", q34, Some(dupPairsSql)),
    QueryDef("q35_minhash_dupes", q35, Some(dupPairsSql), bench = true),
    QueryDef("q174_capped_minhash", q174, Some(dupPairsSql), bench = true),
    QueryDef("q89_dup_components", q89, Some(q89Sql)),
    QueryDef("q135_containment_dupes", q135, Some(q135Sql), bench = true),
    QueryDef("q137_dedup_survivors", q137, Some(q137Sql)),
    QueryDef("q178_capped_survivors", q178, Some(q137Sql)),
    QueryDef("q142_best_survivors", q142, Some(q142Sql)),
    // xxhash64 scale path — rows-only in the driver gate; value-pinned by
    // its portable-hash sibling q69_simhash_portable (oracle-green)
    QueryDef("q36_simhash_dupes", q36, Some(q36Sql)),
    QueryDef("q65_tfidf", q65, Some(q65Sql)),
    QueryDef("q69_simhash_portable", q69, Some(q69Sql)),
    QueryDef("q74_bpe_tokens", q74, Some(q74Sql)),
    QueryDef("q127_fts_and", q127, Some(q127Sql)),
    QueryDef("q128_fts_phrase", q128, Some(q128Sql)),
    QueryDef("q181_fts_phrase_indexed", q181, Some(q128Sql)),
    QueryDef("q129_bm25_rank", q129, Some(q129Sql)),
    QueryDef("q131_heavy_hitters", q131, Some(q131Sql)),
    QueryDef("q132_fts_upsert", q132, Some(q132Sql)),
    QueryDef("q160_stream_fts_ingest", q160, Some(q132Sql)))
}
