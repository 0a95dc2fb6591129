package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-ANN: full-probe configuration must equal brute force exactly;
  * partial-probe must keep high recall at a fraction of the scan. */
class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val e = Tables.embeddings(spark, TestSpark.sf0001).cache()

  private def queryVec(id: Long): Array[Float] =
    e.filter(col("vec_id") === id).select(col("embedding"))
      .head.getSeq[Float](0).toArray

  private def bruteTopK(q: Array[Float], k: Int): Seq[Long] = {
    val qv = array(q.map(lit): _*)
    e.select(col("vec_id"),
        round(graft.functions.CosineSimilarity(col("embedding"), qv), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k).collect().map(_.getLong(0)).toSeq
  }

  test("full probe (nProbe == nLists) equals brute force exactly") {
    val q = queryVec(3)
    val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8, 2)
    val ivf = Similarity.ivfTopK(e, "embedding", "vec_id", q, 10, cents, nProbe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == bruteTopK(q, 10))
  }

  test("partial probe keeps recall while scanning a fraction of lists") {
    val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8, 2)
    val ids = Seq(0L, 7L, 42L)
    val recalls = ids.map { id =>
      val q = queryVec(id)
      val exact = bruteTopK(q, 10).toSet
      val approx = Similarity.ivfTopK(e, "embedding", "vec_id", q, 10, cents, nProbe = 3)
        .collect().map(_.getLong(0)).toSet
      (approx intersect exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 with 3/8 lists = $mean (per-query: $recalls)")
  }

  test("assignment covers every vector with a valid list id") {
    val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8, 1)
    val assigned = Similarity.ivfAssign(e, "embedding", cents)
    assert(assigned.filter(col("list_id").isNull ||
      col("list_id") < 0 || col("list_id") >= 8).count() == 0)
    assert(assigned.count() == e.count())
  }
}
