package graft

import graft.llm.{LlmOps, WeightsFileTts}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production TtsClient seam exercised by a REAL synthesis call path
  * (the EmbedderSeamSpec/LlmSeamSpec recipe applied to L11, closing the
  * last stub-only prod seam): a voice artifact on disk, loaded lazily per
  * JVM, rendered through [[LlmOps.synthesize]]'s mapPartitions batch
  * contract into BinaryType PCM. */
class TtsSeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val voicePath: String = {
    val p = java.nio.file.Files.createTempDirectory("gfts")
      .resolve("voice.gfts").toString
    WeightsFileTts.writeVoice(p)
    p
  }

  private def docs = Tables.documents(spark, TestSpark.sf0001)
    .select(col("doc_id"), col("text")).limit(120)

  private def run(batchSize: Int, parts: Int): Map[Long, Seq[Byte]] = {
    val tts = new WeightsFileTts(voicePath)
    LlmOps.synthesize(docs.repartition(parts), "text", "audio", tts,
        batchSize)
      .select(col("doc_id"), col("audio"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("audio").toSeq)
      .toMap
  }

  test("PCM shape: 16-bit frames, duration proportional to word count") {
    val tts = new WeightsFileTts(voicePath)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val out = run(batchSize = 64, parts = 4)
    assert(out.size == 120)
    rows.foreach { case (id, text) =>
      val words = text.split(" ").count(_.nonEmpty)
      // 8000 Hz * 40 ms/word * 2 bytes
      assert(out(id).length == words * 320 * 2,
        s"doc $id: ${out(id).length} bytes for $words words")
    }
    // non-silent audio: the oscillator actually rendered
    assert(out.values.forall(_.exists(_ != 0)))
    assert(tts.synthesizeBatch(Seq("")).head.isEmpty) // empty text → 0 frames
  }

  test("batch-size and partitioning invariance") {
    val a = run(batchSize = 7, parts = 4)
    assert(a == run(batchSize = 256, parts = 4))
    assert(a == run(batchSize = 64, parts = 13))
  }

  test("distributed result equals a driver-side render; corrupt magic rejected") {
    val tts = new WeightsFileTts(voicePath)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val local = rows.map(_._1)
      .zip(tts.synthesizeBatch(rows.map(_._2).toSeq).map(_.toSeq)).toMap
    assert(run(batchSize = 32, parts = 8) == local)
    val bad = java.nio.file.Files.createTempDirectory("gfts_bad")
      .resolve("bad.gfts")
    java.nio.file.Files.write(bad, Array[Byte](7, 7, 7, 7, 0, 0, 0, 1))
    val ex = intercept[IllegalArgumentException] {
      new WeightsFileTts(bad.toString).synthesizeBatch(Seq("x"))
    }
    assert(ex.getMessage.contains("GFTS"))
  }
}
