package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou/Douze/Schmid, TPAMI 2011) — the
  * memory-bounded ANN serving path the IVF/LSH family lacks: each vector
  * splits into `m` subvectors, each subvector is quantized to one of `k`
  * per-subspace codewords, and the stored representation shrinks from
  * `dim` floats to `m` small ints (dim=64, m=8, k=16: 256 B → 8 B, 32×).
  * Queries score codes by ASYMMETRIC DISTANCE (ADC): the query precomputes
  * one `m × k` lookup table of subvector dot products, so scoring a
  * vector is `m` table lookups + adds — never a full-dim dot — and the
  * usual production recipe re-ranks the ADC top-`rerank` candidates with
  * exact scores. Reference analogue: the Chroma collection the reference
  * stores embeddings in serves ANN from a compressed in-memory index
  * (scripts/scrape_store_embed.py); PQ is how such an index fits RAM when
  * the corpus does not.
  *
  * 100 TB shape: codebooks are an `m × k × subDim` driver-side constant
  * (like IVF centroids — train on a sample; a codebook is a model, not a
  * scan product), encoding is a pure per-row expression (stored with the
  * index, computed once at ingest), and ADC scoring is expression-only
  * over literal tables, inside whole-stage codegen, cut by
  * TakeOrderedAndProject. Composes with the IVF index: store codes per
  * list and ADC-score only probed partitions.
  */
object Pq {

  private def dotLit(v: Column, c: Array[Double]): Column =
    aggregate(zip_with(v, array(c.map(lit): _*),
      (x, h) => x.cast("double") * h), lit(0.0), (a, b) => a + b)

  /** argmin_c ||x − c||² == argmax_c (x·c − ||c||²/2); deterministic
    * tiebreak (highest code wins — the [[Similarity.nearestListExpr]]
    * convention). */
  private def nearestCodeExpr(sv: Column,
      book: Array[Array[Double]]): Column =
    greatest(book.zipWithIndex.map { case (c, i) =>
      struct(dotLit(sv, c) - lit(c.map(x => x * x).sum / 2), lit(i))
    }: _*).getField("col2")

  private def subvec(emb: Column, j: Int, subDim: Int): Column =
    slice(emb, j * subDim + 1, subDim)

  /** Unit-normalize a float-array column (so ADC dot products approximate
    * cosine); zero vectors pass through unscaled. */
  def normalizedExpr(emb: Column): Column = {
    val n = sqrt(aggregate(transform(emb, x => x.cast("double") * x),
      lit(0.0), (a, b) => a + b))
    transform(emb, x =>
      x.cast("double") / when(n === 0.0, lit(1.0)).otherwise(n))
  }

  /** Per-subspace k-means codebooks, `m × k × (dim/m)`. Deterministic:
    * init = the k lowest-id rows' subvectors, then `iters` rounds of
    * assign + Summarizer.mean (one mean row per occupied code — the
    * [[Similarity.listMeans]] shape, never k × dim scalar rows). Driver
    * holds m·k·subDim = dim·k doubles — a model constant. At 100 TB train
    * on a bounded sample; codebook quality needs representative data, not
    * all of it. */
  def trainCodebooks(vecs: DataFrame, embCol: String, idCol: String,
      m: Int, k: Int, iters: Int = 2): Array[Array[Array[Double]]] = {
    require(k > 0 && k <= 256, s"k=$k out of range (codes are small ints)")
    val dim = vecs.select(size(col(embCol))).head.getInt(0)
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    Array.tabulate(m) { j =>
      val sub = vecs.select(col(idCol).as("id"),
        transform(subvec(col(embCol), j, subDim),
          x => x.cast("double")).as("sv"))
      // k-row init collect (codebook seed), bounded by k <= 256
      var book: Array[Array[Double]] = sub.orderBy(col("id")).limit(k)
        .select(col("sv")).collect()
        .map(_.getSeq[Double](0).toArray)
      for (_ <- 1 to iters) {
        // one mean-vector row per occupied code, <= k rows
        val means = sub
          .select(nearestCodeExpr(col("sv"), book).as("code"),
            org.apache.spark.ml.functions.array_to_vector(col("sv")).as("v"))
          .groupBy(col("code"))
          .agg(org.apache.spark.ml.stat.Summarizer.mean(col("v")).as("mv"))
          .collect()
        val next = Array.tabulate(book.length)(i => book(i).clone())
        means.foreach { r =>
          next(r.getInt(0)) =
            r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray
        }
        book = next
      }
      book
    }
  }

  /** Encode a (normalized) vector to its `m` nearest-codeword ids — the
    * stored index representation; pure expression, computed at ingest. */
  def encodeExpr(emb: Column, books: Array[Array[Array[Double]]]): Column = {
    val subDim = books(0)(0).length
    array(books.indices.map { j =>
      nearestCodeExpr(
        transform(subvec(emb, j, subDim), x => x.cast("double")), books(j))
    }: _*)
  }

  /** The query's ADC table: lut(j)(c) = q_j · book_j(c), computed once
    * driver-side (m·k doubles). */
  def adcLut(query: Array[Double],
      books: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val subDim = books(0)(0).length
    books.zipWithIndex.map { case (book, j) =>
      val qj = query.slice(j * subDim, (j + 1) * subDim)
      book.map(c => c.zip(qj).map { case (a, b) => a * b }.sum)
    }
  }

  /** ADC score of a codes column under a query's lookup table: m literal
    * array lookups summed in fixed subspace order — expression-only,
    * codegen-friendly, no per-row vector math. */
  def adcScoreExpr(codes: Column, lut: Array[Array[Double]]): Column =
    lut.indices.map { j =>
      element_at(array(lut(j).map(lit): _*), element_at(codes, j + 1) + 1)
    }.reduce(_ + _)

  /** PQ ANN top-k with exact re-rank: normalize, encode (inline here; a
    * deployed index stores the codes), cut to `rerank` candidates by ADC
    * (TakeOrderedAndProject), then exact-cosine re-rank the survivors.
    * Output matches the brute-force ranker's schema (id, sim). */
  def pqTopK(vecs: DataFrame, embCol: String, idCol: String,
      query: Array[Float], k: Int, books: Array[Array[Array[Double]]],
      rerank: Int): DataFrame = {
    val qn = {
      val q = query.map(_.toDouble)
      val n = math.sqrt(q.map(x => x * x).sum)
      if (n == 0.0) q else q.map(_ / n)
    }
    val cand = vecs
      .withColumn("__codes",
        encodeExpr(normalizedExpr(col(embCol)), books))
      .withColumn("__adc", adcScoreExpr(col("__codes"), adcLut(qn, books)))
      .orderBy(col("__adc").desc, col(idCol)).limit(rerank)
    val qv = array(query.map(lit): _*)
    cand.select(col(idCol),
        round(graft.functions.CosineSimilarity(col(embCol), qv), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col(idCol)).limit(k)
  }
}
