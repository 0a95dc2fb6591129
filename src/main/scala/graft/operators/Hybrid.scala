package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — fuse independently-ranked result lists from the
  * engine's serving indexes (the FTS postings index's BM25 leg, the IVF
  * index's ANN leg) by RECIPROCAL-RANK FUSION:
  *
  *   rrf(d) = Σ_legs 1 / (k + rank_leg(d)),   absent leg contributes 0
  *
  * (Cormack/Clarke/Buettcher, SIGIR'09 — the fusion Elasticsearch/
  * OpenSearch ship for hybrid search). Rank-based fusion needs no score
  * normalization, so legs with incomparable score scales (BM25 in
  * [0, ~10], cosine in [-1, 1]) compose without tuning — the property
  * q119's 50/50 score blend lacks. Reference analogue: the Chroma store
  * serves BOTH `embedding_fulltext_search*` FTS tables and vector
  * similarity from one collection (scripts/vector_db/chroma.sqlite3);
  * this operator is the ranker that merges those two access paths.
  *
  * 100 TB shape: each leg is already index-served top-k (term-bucket
  * pruned BM25, list-pruned IVF probe), so fusion touches ≤ Σ k rows —
  * the corpus never reaches this operator.
  */
object Hybrid {

  /** Deterministic top-k ranks of a scored leg: TakeOrderedAndProject
    * cuts to k rows FIRST (scale-safe — no global sort, no full-width
    * shuffle), then a row_number window runs over the ≤ k survivors
    * (single-partition by construction, bounded by k not the corpus).
    * Ties break on id, so ranks are reproducible cross-engine. */
  def topRanks(scored: DataFrame, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    val top = scored.orderBy(col(scoreCol).desc, col(idCol)).limit(k)
    top.select(col(idCol),
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol)))
        .cast("long").as("rank"))
  }

  /** Fuse ranked legs (each `(name, df(idCol, rank))`) into one table:
    * `idCol, <name>_rank... (0 = absent from that leg), rrf`. The fused
    * score adds per-leg terms in the caller's fixed leg order, so the
    * double sum is deterministic and cross-engine reproducible (the
    * [[Fts.bm25Scores]] fixed-order-fold rule). */
  def rrfFuse(legs: Seq[(String, DataFrame)], idCol: String,
      kRrf: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    val joined = legs.map { case (n, df) =>
        df.select(col(idCol), col("rank").as(s"${n}_rank"))
      }.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val filled = legs.foldLeft(joined) { case (df, (n, _)) =>
      df.withColumn(s"${n}_rank", coalesce(col(s"${n}_rank"), lit(0L)))
    }
    val score = legs.map { case (n, _) =>
      when(col(s"${n}_rank") > 0,
        lit(1.0) / (lit(kRrf.toDouble) + col(s"${n}_rank")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    filled.withColumn("rrf", round(score, 6))
  }
}
