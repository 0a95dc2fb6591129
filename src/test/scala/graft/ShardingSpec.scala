package graft

import graft.operators.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Balanced training shards ([[Curation.balancedShards]]): the distributed
  * exact-rank serpentine packer must (1) equal the single-window reference
  * formulation — proving the range-partition + offset + local-id rank is
  * the exact global rank, (2) be invariant to the range partition count,
  * (3) bound the per-shard token spread by ~one max doc, which is the
  * whole point over hash assignment on a heavy-tailed length
  * distribution. */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.documents(spark, TestSpark.sf0001)

  private def assignment(rangeParts: Int): Map[Long, Long] =
    Curation.balancedShards(docs, nShards = 8, rangeParts = rangeParts)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap

  test("distributed rank equals the single-window reference; partition-count invariant") {
    val dist = assignment(rangeParts = 7) // odd, small: offsets do real work
    val dist32 = assignment(rangeParts = 32)
    // reference: one global window (fine at test scale; the op exists so
    // production never plans this single-partition sort)
    val w = Window.orderBy(col("n_toks").desc, col("doc_id"))
    val ref = docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_toks"))
      .withColumn("rk", row_number().over(w) - 1)
      .withColumn("shard",
        when(expr("(rk div 8) % 2 = 0"), col("rk") % 8)
          .otherwise(lit(7) - col("rk") % 8).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    assert(dist.size == ref.size)
    assert(dist == ref, "distributed rank diverged from the global window")
    assert(dist32 == ref, "assignment depends on the range partition count")
  }

  test("token spread is bounded by one max doc; beats hash assignment on spread") {
    val sh = Curation.balancedShards(docs, nShards = 8)
    val totals = sh.groupBy(col("shard")).agg(sum(col("n_toks")).as("t"))
      .collect().map(_.getAs[Long]("t"))
    assert(totals.length == 8)
    val spread = totals.max - totals.min
    val maxDoc = sh.agg(max(col("n_toks")).cast("long")).head.getLong(0)
    assert(spread <= maxDoc,
      s"serpentine spread $spread exceeds one max doc ($maxDoc)")
    // hash assignment on the same corpus: balanced in expectation only —
    // on this heavy-tailed corpus its spread is strictly worse
    val hashTotals = docs
      .select((((col("doc_id") % 100) * lit(61L)) % 8).as("hs"), // knuth-mod family
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_toks"))
      .groupBy(col("hs")).agg(sum(col("n_toks")).as("t"))
      .collect().map(_.getAs[Long]("t"))
    val hashSpread = hashTotals.max - hashTotals.min
    info(s"serpentine spread=$spread, hash spread=$hashSpread, maxDoc=$maxDoc")
    assert(spread <= hashSpread,
      s"serpentine ($spread) should not be worse than hash ($hashSpread)")
  }

  test("assignment is deterministic across invocations") {
    assert(assignment(rangeParts = 16) == assignment(rangeParts = 16))
  }

  test("epochExpand: copy counts follow the plan exactly; sub-epoch plans downsample") {
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, "src", "w " * 5)).toDF(
      "doc_id", "source", "text")
    // 2.5 epochs: every doc 2 copies + a deterministic-hash half chance
    val plan25 = Seq(("src", 25000L)).toDF("source", "repeat_bp")
    val out = Curation.epochExpand(d, plan25)
    val perDoc = out.groupBy(col("doc_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.size == 1000)
    assert(perDoc.values.forall(n => n == 2 || n == 3))
    val total = perDoc.values.sum
    // the draw is the Knuth 31-bit permutation of the folded key cut to
    // mod 10000: over 1000 consecutive ids the sub-5000 mass is
    // near-exactly half
    assert(math.abs(total - 2500L) <= 50, s"total copies $total")
    // epoch ids are 0..n-1 per doc
    val epochs = out.filter(col("doc_id") === perDoc.keys.head)
      .select(col("epoch")).collect().map(_.getLong(0)).sorted
    assert(epochs.sameElements(0L until epochs.length.toLong))
    // sub-epoch plan (0.3 epochs) = deterministic downsampling: docs with
    // draw >= 3000 emit ZERO rows and are absent
    val out03 = Curation.epochExpand(d, Seq(("src", 3000L))
      .toDF("source", "repeat_bp"))
    val n03 = out03.count()
    assert(n03 > 200 && n03 < 400, s"0.3-epoch rows: $n03")
    assert(out03.groupBy(col("doc_id")).count()
      .filter(col("count") =!= 1).count() == 0)
    // and the whole thing is reproducible
    assert(out.count() == Curation.epochExpand(d, plan25).count())
  }

  test("epochExpand: structured id spaces still see the fractional draw") {
    import spark.implicits._
    // ids all sharing residue 0 mod 10000 — the round-8 advice finding:
    // a bare `doc_id mod 10000` draw gives every one of these the SAME
    // draw value (0), so a 2.5-epoch plan would emit 3 copies for ALL of
    // them. The folded-Knuth draw must split them near-half.
    val d = (0L until 1000L).map(i => (i * 10000L, "src", "w"))
      .toDF("doc_id", "source", "text")
    val plan25 = Seq(("src", 25000L)).toDF("source", "repeat_bp")
    val extra = Curation.epochExpand(d, plan25).count() - 2000L
    assert(extra > 400 && extra < 600,
      s"stride-10000 ids got $extra/1000 fractional copies — draw is " +
        "still correlated with the id structure")
  }

  test("epochExpand: a source absent from the plan contributes zero copies") {
    import spark.implicits._
    val d = Seq((1L, "a", "w"), (2L, "b", "w")).toDF(
      "doc_id", "source", "text")
    val planA = Seq(("a", 10000L)).toDF("source", "repeat_bp")
    val out = Curation.epochExpand(d, planA).collect()
    // doc 1 passes through once; doc 2's source is not in the mix — the
    // left join + coalesce(bp, 0) makes that an explicit 0-copy verdict
    assert(out.map(_.getAs[String]("source")).toSet == Set("a"))
    assert(out.length == 1)
  }
}
