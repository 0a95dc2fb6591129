package graft

import graft.llm.{LlmOps, WeightsFileLlm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production LlmClient seam exercised by a REAL inference call path
  * (round-9 verdict #6 — the EmbedderSeamSpec recipe applied to L6–L10):
  * a bigram LM trained by the engine, published as a binary artifact,
  * loaded lazily per JVM, and decoded greedily through
  * [[LlmOps.complete]]'s mapPartitions batch contract. What a real
  * ChatCompletion client relies on is pinned here: batch-size invariance
  * (grouped() boundaries invisible), partitioning invariance, the
  * distributed result equal to a driver-side decode, two artifact loads
  * agreeing, corrupt artifacts rejected, and every op deterministic. */
class LlmSeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val modelPath: String = {
    val p = java.nio.file.Files.createTempDirectory("gftl")
      .resolve("bigram.gftl").toString
    WeightsFileLlm.train(
      Tables.documents(spark, TestSpark.sf0001), "text", p, maxVocab = 64)
    p
  }

  private def docs = Tables.documents(spark, TestSpark.sf0001)
    .select(col("doc_id"), col("text")).limit(200)

  private def run(op: String, batchSize: Int,
      parts: Int): Map[Long, String] = {
    val llm = new WeightsFileLlm(modelPath)
    LlmOps.complete(docs.repartition(parts), op, "text", "out", llm,
        batchSize)
      .select(col("doc_id"), col("out"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("generate: non-empty greedy continuations, op-tagged") {
    val out = run("generate", batchSize = 64, parts = 4)
    assert(out.size == 200)
    assert(out.values.forall(_.startsWith("[generate] ")))
    // the corpus vocabulary is dense in the prompts, so the greedy chain
    // finds a seed and at least one continuation step for every doc
    assert(out.values.count(_.length > "[generate] ".length) == 200)
  }

  test("all ops are deterministic across two full runs") {
    for (op <- Seq("generate", "summarize", "refine", "sentiment"))
      assert(run(op, 64, 4) == run(op, 64, 4), s"op $op nondeterministic")
  }

  test("batch-size invariance: grouped() boundaries don't change output") {
    // 7 forces ragged batches (200 = 28*7 + 4); 256 is one batch per
    // partition — a client that leaked state across a batch diverges here
    assert(run("generate", batchSize = 7, parts = 4) ==
      run("generate", batchSize = 256, parts = 4))
  }

  test("partitioning invariance: executor-local model loads agree") {
    assert(run("sentiment", batchSize = 64, parts = 1) ==
      run("sentiment", batchSize = 64, parts = 13))
  }

  test("distributed result equals a driver-side decode") {
    val llm = new WeightsFileLlm(modelPath)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val local = rows.map(_._1)
      .zip(llm.completeBatch("summarize", rows.map(_._2).toSeq)).toMap
    assert(run("summarize", batchSize = 32, parts = 8) == local)
  }

  test("two loads agree; corrupt magic rejected; unknown op rejected") {
    val a = new WeightsFileLlm(modelPath)
      .completeBatch("generate", Seq("the table scan"))
    val b = new WeightsFileLlm(modelPath)
      .completeBatch("generate", Seq("the table scan"))
    assert(a == b)
    val bad = java.nio.file.Files.createTempDirectory("gftl_bad")
      .resolve("bad.gftl")
    java.nio.file.Files.write(bad, Array[Byte](9, 9, 9, 9, 1, 2, 3, 4))
    val ex = intercept[IllegalArgumentException] {
      new WeightsFileLlm(bad.toString).completeBatch("generate", Seq("x"))
    }
    assert(ex.getMessage.contains("GFTL"))
    val ex2 = intercept[IllegalArgumentException] {
      new WeightsFileLlm(modelPath).completeBatch("translate", Seq("x"))
    }
    assert(ex2.getMessage.contains("unknown LLM op"))
  }

  test("sentiment labels split on the artifact's score cut, score visible") {
    val out = run("sentiment", batchSize = 64, parts = 4)
    assert(out.values.forall(v =>
      v.matches("\\[sentiment\\] (positive|negative) score=-?\\d+")))
    // both classes occur on natural-shaped text (the cut is the corpus
    // expectation, so docs fall on both sides)
    val labels = out.values.map(_.split(" ")(1)).toSet
    assert(labels == Set("positive", "negative"),
      s"degenerate sentiment split: $labels")
  }
}
