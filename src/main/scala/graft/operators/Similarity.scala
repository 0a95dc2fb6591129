package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search (north-star scale path for L2):
  * random-hyperplane LSH — bucket = sign bits of the vector against
  * `numPlanes` seeded hyperplanes; a query probes its own bucket plus all
  * hamming-1 neighbors and brute-forces cosine within the candidates.
  *
  * At 100 TB the index is bucketed/partitioned by `bucket`, so a query reads
  * ~(numPlanes+1)/2^numPlanes of the data instead of all of it; recall is
  * tunable via numPlanes and the probe radius. Exact brute force
  * (SimilarityQueries.q40) remains the oracle baseline.
  */
object Similarity {

  /** Deterministic hyperplanes: seeded Gaussian components. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket id of a vector (expression composition over a literal
    * plane matrix — stays declarative, no UDF). */
  def bucketExpr(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(emb, array(p.map(lit): _*), (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Index side: embeddings table + bucket column. */
  def bucketize(emb: DataFrame, embCol: String, planes: Array[Array[Double]]): DataFrame =
    emb.withColumn("bucket", bucketExpr(col(embCol), planes))

  private def bucketOf(v: Array[Float], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = v.zip(p).map { case (x, h) => x.toDouble * h }.sum
      if (dot >= 0) 1L << i else 0L
    }.reduce(_ | _)

  /** ANN top-k: probe the query bucket and its hamming-1 neighbors, exact
    * cosine within candidates. */
  def annTopK(index: DataFrame, embCol: String, idCol: String,
      query: Array[Float], k: Int, numPlanes: Int = 6, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(query.length, numPlanes, seed)
    val qb = bucketOf(query, planes)
    val probes = qb +: (0 until numPlanes).map(i => qb ^ (1L << i))
    val qv = array(query.map(lit): _*)
    bucketize(index, embCol, planes)
      .filter(col("bucket").isInCollection(probes))
      .select(col(idCol),
        VectorFunctions.cosineSim(col(embCol), qv).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
