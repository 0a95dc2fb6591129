package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + structural checks over the declared query inventory; deep
  * correctness is the DuckDB oracle gate (tools/check_oracle.py). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.defs.foreach { q =>
      val n = q.run(spark, TestSpark.sf0001).count()
      assert(n >= 0, s"${q.name} failed")
    }
  }

  test("minhash-LSH dup pairs equal brute-force jaccard pairs (sf0.01)") {
    val brute = SparkEntry.queries("q34_jaccard_dupes")(spark, TestSpark.sf001)
      .collect().map(_.toSeq).toSet
    val lsh = SparkEntry.queries("q35_minhash_dupes")(spark, TestSpark.sf001)
      .collect().map(_.toSeq).toSet
    assert(brute.nonEmpty)
    assert(lsh == brute)
  }

  test("simhash finds the near-dup pairs with high recall (sf0.01)") {
    val truth = SparkEntry.queries("q34_jaccard_dupes")(spark, TestSpark.sf001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = SparkEntry.queries("q36_simhash_dupes")(spark, TestSpark.sf001)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // This corpus's 31-word vocabulary keeps many frequency-vector
    // simhashes close, so hamming≤3 is a precision-first screen: expect
    // solid-but-partial recall and few extras (MinHash is the exact path).
    val recall = (truth & sim).size.toDouble / truth.size
    assert(recall >= 0.5, s"recall=$recall truth=${truth.size} sim=${sim.size}")
    assert(sim.size <= truth.size * 2, s"too many simhash pairs: ${sim.size}")
  }
}
