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

  /** The WIDE yardstick set (SPARK_GRAFT_BENCH_SET=wide): every query
    * whose DuckDB oracle runs the SAME algorithm at a comparable data
    * scale — the bench set plus [[wideExtra]]. tools/yardstick.py times
    * this set at ×10 and holds each member to the ≤2× contract
    * (floor/pin exemption rules unchanged); [[yardstickExcluded]]
    * documents why every remaining query is NOT a fair timing pair.
    * QueriesSpec asserts the three groups partition `defs` exactly, so a
    * new query cannot silently dodge the contract. */
  def wideBenchQueries: Seq[QueryDef] =
    defs.filter(q => q.bench || wideExtra.contains(q.name))

  /** Same-algorithm oracle-backed queries added to the wide yardstick set
    * beyond the bench subset. */
  val wideExtra: Set[String] = Set(
    "q06_region_revenue", "q182_region_revenue_factfirst",
    "q07_topn_per_nation", "q09_order_delta",
    "q10_semi_join", "q11_anti_join", "q12_distinct", "q13_union",
    "q14_intersect", "q15_except", "q16_having", "q17_conditional_agg",
    "q18_rollup", "q19_above_avg", "q20_string_funcs", "q21_regex",
    "q22_ordered_concat", "q25_events_dedup_first", "q26_orders_by_month",
    "q28_stats_agg", "q29_json_extract", "q32_fingerprints",
    "q33_quality_score", "q41_label_centroids",
    "q46_fts_postings", "q47_media_features", "q48_langid",
    "q49_above_part_avg", "q51_status_pivot",
    "q55_value_windows", "q56_cube", "q57_grouping_sets", "q58_full_outer",
    "q59_dense_grid", "q60_array_funcs", "q61_date_arith",
    "q63_salted_join", "q64_hotkey_join", "q65_tfidf", "q66_sql_surface",
    "q68_typed_agg", "q70_binary_digest", "q72_embed_portable",
    "q73_rag_portable", "q74_bpe_tokens", "q75_media_extract",
    "q77_no_order_custs", "q78_supplier_cnt", "q80_rank_family",
    "q82_math_funcs", "q83_range_join", "q85_deciles_scalable",
    "q86_mlb_team_season", "q87_mlb_game_stats", "q91_stratified_sample",
    "q92_pii_scrub", "q93_repetition", "q94_seq_packing",
    "q96_embed_quantize", "q97_doc_chunks", "q99_quality_funnel",
    "q100_auto_range_join", "q103_train_shuffle", "q106_leakage_split",
    "q107_scd2", "q108_zorder", "q110_vocab_pairs", "q112_snapshot_diff",
    "q113_mix_rebalance", "q116_unpivot", "q119_hybrid_rank",
    "q120_funnel", "q121_cohort_retention", "q122_peak_concurrency",
    "q123_exact_sample", "q124_skew_report", "q125_table_profile",
    "q126_bpe_merges", "q127_fts_and", "q128_fts_phrase",
    "q129_bm25_rank", "q130_bpe_encode", "q133_tokenize_pack",
    "q139_decontam_corpus", "q140_quality_floor", "q141_index_orphans",
    "q152_trained_filter", "q156_temperature_mix", "q157_classifier_prune",
    "q161_importance_resample", "q163_hard_negatives",
    "q168_tokenizer_audit", "q179_balanced_shards", "q180_epoch_expand")

  /** Why each remaining query is NOT in the wide yardstick set — the
    * documented different-algorithm / different-work pairs the round-8
    * verdict asked for. Key → reason; QueriesSpec enforces exhaustiveness
    * (defs = bench ∪ wideExtra ∪ this, disjointly). */
  val yardstickExcluded: Map[String, String] = {
    val streaming = "Structured Streaming micro-batch loop vs a batch SQL" +
      " oracle: the wall times the streaming engine machinery, not a" +
      " comparable plan"
    val sketch = "approximate sketch vs the oracle's exact/contract" +
      " computation — the sketch IS the algorithm difference"
    val index = "builds/probes a persisted index inside the query (index" +
      " write + pruned read) while the oracle recomputes directly — the" +
      " q171-reuses-q170 pattern"
    val brute = "deliberately brute O(n^2) oracle, infeasible at the x10" +
      " replica (CORRECTNESS_x10 skip list); the same-contract scale path" +
      " IS in the set"
    val stub = "deterministic stub-embedder seam with a contract oracle," +
      " not a same-algorithm computation"
    Map(
      "q67_stream_sessions" -> streaming, "q76_stream_hourly" -> streaming,
      "q88_stream_attribution" -> streaming,
      "q98_stream_session_window" -> streaming,
      "q111_stream_scd2" -> streaming, "q115_stream_enrich" -> streaming,
      "q118_stream_dedup_ttl" -> streaming,
      "q138_stream_heavy_hitters" -> streaming,
      "q145_stream_ingest_dedup" -> streaming,
      "q154_stream_ann_ingest" -> streaming,
      "q160_stream_fts_ingest" -> streaming,
      "q171_stream_mlsh_ingest" -> streaming,
      "q44_approx_distinct" -> sketch, "q79_approx_quantile" -> sketch,
      "q101_sketch_merge" -> sketch, "q109_cms_contract" -> sketch,
      "q131_heavy_hitters" -> sketch, "q155_overlap_sketch" -> sketch,
      "q42_embed_documents" -> stub, "q43_rag_retrieve" -> stub,
      // q181 was a wide-set member in round 10, where its ~0.9× serving
      // wall flattered the aggregate: it probes a per-JVM-memoized
      // persisted index (built once in the bench warm-up) while the
      // DuckDB oracle recomputes the phrase from the raw corpus — the
      // exact asymmetry this `index` class excludes (round-10 ADVICE).
      // It stays in the correctness set, and its serving wall is
      // measured SEPARATELY as the ×1000 probe demo (bench/r11/).
      "q181_fts_phrase_indexed" -> index,
      "q62_ivf_knn" -> index, "q132_fts_upsert" -> index,
      "q146_ivf_index_upsert" -> index, "q147_ivf_recrawl_upsert" -> index,
      "q148_hybrid_rrf" -> index, "q149_compacted_rrf" -> index,
      "q150_pq_ann" -> index, "q151_ivfpq_index" -> index,
      "q158_ann_eval" -> index, "q159_lsh_index_recrawl" -> index,
      "q165_index_mined_negatives" -> index, "q169_mlsh_eval" -> index,
      "q170_mlsh_recrawl" -> index, "q172_ivf_eval" -> index,
      "q173_ivfpq_eval" -> index, "q176_mlsh_multiprobe" -> index,
      "q71_lake_roundtrip" -> ("the query's work is a partitioned lake" +
        " WRITE + read-back; the oracle never writes"),
      "q166_orc_roundtrip" -> ("the query's work is an ORC lake WRITE +" +
        " read-back; the oracle never writes"),
      "q81_dsv2_source" -> ("rows come from the DataSourceV2 synthetic" +
        " connector, not the shared parquet the oracle reads"),
      "q102_dsv2_pushdown" -> ("rows come from the DataSourceV2 synthetic" +
        " connector, not the shared parquet the oracle reads"),
      // reclassified by the round-10 full ×100 run (the first scale where
      // these read as ratios at all): q36's oracle ENUMERATES the planted
      // pairs (SELECT doc_id, doc_id+100000, 0 WHERE doc_id < 50 — 4 ms at
      // ×100) while the engine runs the actual simhash+banding recall
      // check — a correctness contract, not a timing pair (organic
      // simhash timing lives with q69's brute class); q53 is the
      // DOCUMENTED single-partition global-ntile baseline whose scaladoc
      // has always said "at 100 TB use the q85 decomposition" — q85
      // (IDENTICAL oracle) is in the set and passes ×100 at 1.10×, so
      // timing the deliberate anti-pattern pair-wise measures the
      // documentation, not the engine
      "q36_simhash_dupes" -> ("planted-pair recall contract: the oracle" +
        " enumerates the injected pairs in O(50) while the engine runs" +
        " simhash+banding — not a same-algorithm timing pair"),
      "q53_deciles" -> ("documented single-partition global-ntile" +
        " baseline; the same-oracle scale path q85_deciles_scalable is" +
        " in the set (1.10x at x100)"),
      "q34_jaccard_dupes" -> brute, "q45_embedding_neardup" -> brute,
      "q69_simhash_portable" -> brute, "q84_embedding_neardup_lsh" -> brute,
      "q89_dup_components" -> brute, "q136_semantic_survivors" -> brute,
      "q137_dedup_survivors" -> brute, "q142_best_survivors" -> brute,
      "q143_dedup_index_probe" -> brute, "q144_dedup_index_upsert" -> brute,
      "q167_incremental_curation" -> brute,
      "q175_capped_incremental" -> brute,
      "q177_capped_index_probe" -> brute, "q178_capped_survivors" -> brute)
  }
}
