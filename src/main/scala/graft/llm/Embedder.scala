package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Text→vector embedding seam (SURVEY.md §2.9 L1; reference behavior:
  * SentenceTransformer batch-encode at
  * airflow/dags/mlb_pipeline/pipeline.py:66-68). The engine contract is
  * batched partition-level inference — model overhead amortized over the
  * whole partition, never a row-at-a-time UDF (SURVEY §4 O10). Production
  * would plug an ONNX/remote model behind the same trait; tests use the
  * deterministic feature-hash implementation below, which preserves
  * retrieval semantics (fixed dim, cosine-comparable, deterministic)
  * without shipping model weights.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  def embed(text: String): Array[Float] = embedBatch(Seq(text)).head
}

/** Deterministic feature-hashing embedder: each whitespace token hashes to a
  * bucket with ±1 sign (murmur3, fixed seed), vector L2-normalized. */
final class FeatureHashEmbedder(override val dim: Int = 64) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    var i = 0
    val toks = t.split(" ")
    while (i < toks.length) {
      val w = toks(i)
      if (w.nonEmpty) {
        val h = scala.util.hashing.MurmurHash3.stringHash(w, 42)
        val idx = math.floorMod(h, dim)
        v(idx) += (if (((h >>> 31) & 1) == 0) 1f else -1f)
      }
      i += 1
    }
    var ss = 0.0
    v.foreach(x => ss += x.toDouble * x.toDouble)
    val n = math.sqrt(ss)
    if (n > 0) v.map(x => (x / n).toFloat) else v
  }
}

/** Feature-hashing embedder with a cross-engine-reproducible hash (the
  * 31-bit polynomial char fold, as Dedup.portableWordHash) and NO
  * normalization: bucket sums stay exact integers, so the whole embedding —
  * and every downstream cosine (scale-invariant, so retrieval semantics are
  * unchanged) — is reproducible bit-for-bit in the DuckDB oracle
  * (q72/q73). The murmur3 FeatureHashEmbedder remains the default
  * production stub; this one exists to put the L1/L2 pipeline under the
  * correctness gate. */
final class PortableHashEmbedder(override val dim: Int = 64) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    t.split(" ").foreach { w =>
      if (w.nonEmpty) {
        var h = 0L
        var i = 0
        while (i < w.length) {
          h = (h * 31 + w.charAt(i).toLong) % 2147483647L
          i += 1
        }
        val idx = (h % dim).toInt
        v(idx) += (if ((h / dim) % 2 == 0) 1f else -1f)
      }
    }
    v
  }
}

object EmbedOps {
  /** Append an `array<float>` embedding column, batching `batchSize` rows per
    * model call inside mapPartitions. */
  def embedText(df: DataFrame, textCol: String, outCol: String,
      embedder: Embedder, batchSize: Int = 256): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(_.getString(textIdx)))
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v.toSeq))
      }
    }(Encoders.row(schema))
  }
}
