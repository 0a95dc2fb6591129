package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, StringType}

/** LLM / TTS operator seams (SURVEY.md §2.9 L6–L11). The reference calls
  * OpenAI chat completions (pipeline.py:95-140, 144-229) and ElevenLabs TTS
  * (pipeline.py:287-325); both are nondeterministic network effects, so the
  * engine quarantines them behind traits. The deterministic stubs preserve
  * operator SHAPE (prompt in → text/bytes out, partition-batched) so every
  * downstream operator is testable; production swaps the impl, nothing else.
  */
trait LlmClient extends Serializable {
  /** op ∈ {answer, summarize, generate, refine, sentiment}. */
  def completeBatch(op: String, prompts: Seq[String]): Seq[String]
}

trait TtsClient extends Serializable {
  def synthesizeBatch(texts: Seq[String]): Seq[Array[Byte]]
}

/** Deterministic template-echo LLM: output = op tag + content digest +
  * truncated prompt (mirrors the reference's prompt→completion dataflow
  * with a pure function). */
final class StubLlm extends LlmClient {
  private def digest(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString

  override def completeBatch(op: String, prompts: Seq[String]): Seq[String] =
    prompts.map { p =>
      val body = op match {
        case "sentiment" =>
          // bullet-list shape like the reference's fan-reaction agent
          Seq("- positive: " + digest(p), "- negative: " + digest(p.reverse))
            .mkString("\n")
        case _ => p.linesIterator.take(2).mkString(" ").take(120)
      }
      s"[$op:${digest(p)}] $body"
    }
}

/** Deterministic TTS: MD5-keyed pseudo-audio bytes, length proportional to
  * the input text (binary media column semantics, K3). */
final class StubTts extends TtsClient {
  override def synthesizeBatch(texts: Seq[String]): Seq[Array[Byte]] =
    texts.map { t =>
      val seed = MessageDigest.getInstance("MD5")
        .digest(t.getBytes(StandardCharsets.UTF_8))
      val out = new Array[Byte](math.max(16, math.min(t.length, 4096)))
      var i = 0
      while (i < out.length) { out(i) = seed(i % seed.length); i += 1 }
      out
    }
}

object LlmOps {
  /** Partition-batched LLM scalar transform: adds `outCol` completing
    * `promptCol` under `op`. mapPartitions + grouped batching per SURVEY §4
    * O10 — per-row UDF calls would be catastrophically slow against a real
    * model endpoint. */
  def complete(df: DataFrame, op: String, promptCol: String, outCol: String,
      llm: LlmClient, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val outs = llm.completeBatch(op, batch.map(_.getString(idx)))
        batch.lazyZip(outs).map((r, o) => Row.fromSeq(r.toSeq :+ o))
      }
    }(Encoders.row(schema))
  }

  /** Partition-batched TTS: text column → binary audio column (L11). */
  def synthesize(df: DataFrame, textCol: String, outCol: String,
      tts: TtsClient, batchSize: Int = 64): DataFrame = {
    val schema = df.schema.add(outCol, BinaryType)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val outs = tts.synthesizeBatch(batch.map(_.getString(idx)))
        batch.lazyZip(outs).map((r, o) => Row.fromSeq(r.toSeq :+ o))
      }
    }(Encoders.row(schema))
  }
}
