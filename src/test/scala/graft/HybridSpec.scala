package graft

import graft.operators.Hybrid
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for RRF hybrid fusion (value exactness is q148's oracle;
  * these pin shapes and edge cases). */
class HybridSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def leg(rows: (Long, Double)*) =
    Hybrid.topRanks(rows.toDF("id", "s"), "id", "s", 10)

  test("rrf: a doc in both legs outranks a doc at the same rank in one leg") {
    val a = leg(1L -> 0.9, 2L -> 0.8)
    val b = leg(1L -> 0.7, 3L -> 0.6)
    val fused = Hybrid.rrfFuse(Seq("x" -> a, "y" -> b), "id")
      .orderBy(col("rrf").desc, col("id")).collect()
    assert(fused.head.getLong(0) == 1L) // rank 1 in x AND rank 2 in y
    // absent legs carry rank 0 and contribute nothing
    val m = fused.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(2L) == (2L, 0L) && m(3L) == (0L, 2L))
  }

  test("topRanks: ties break on id; k cuts before ranking") {
    val r = leg(5L -> 0.5, 3L -> 0.5, 4L -> 0.7)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(4L -> 1L, 3L -> 2L, 5L -> 3L))
    val cut = Hybrid.topRanks(
      (1L to 25L).map(i => (i, i.toDouble)).toDF("id", "s"), "id", "s", 10)
    assert(cut.count() == 10 && cut.agg(min(col("id"))).head.getLong(0) == 16L)
  }

  test("rrf scores are the fixed-order reciprocal sums") {
    val a = leg(1L -> 1.0)
    val fused = Hybrid.rrfFuse(Seq("x" -> a, "y" -> a), "id").collect()
    assert(fused.length == 1)
    assert(math.abs(fused.head.getDouble(3) - 2.0 / 61) < 1e-6)
  }
}
