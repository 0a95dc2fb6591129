package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north-star requirement): media as opaque
  * `binary` columns with typed metadata, processed by partition-batched
  * transforms. The actual decoders (image/audio codecs) are NOT available in
  * this environment, so the decode step is a clearly-marked deterministic
  * stub — the Spark-side contract (schema, batching, partitioning, output
  * shape) is real and tested, mirroring the reference's binary audio path
  * (MP3 bytes → object store, pipeline.py:314-346).
  */
object Multimodal {

  /** media table schema: typed metadata + opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),      // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", IntegerType))))))

  /** STUB decode: a real implementation hands `payload` to a codec; here the
    * "decoded signal" is a deterministic digest so downstream feature shape
    * and batching are exercisable without codecs. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val d = MessageDigest.getInstance("MD5").digest(payload)
    d.grouped(4).take(4).map { g =>
      java.nio.ByteBuffer.wrap(g.padTo(4, 0.toByte)).getInt.toFloat / Int.MaxValue
    }.toArray
  }

  /** Digest-byte decode with exact small-integer features (each in
    * [0, 255], exactly representable as Float): the oracle-checkable stub —
    * DuckDB recomputes the same values from md5 hex (q75). */
  def byteDecode(payload: Array[Byte]): Array[Float] = {
    val d = MessageDigest.getInstance("MD5").digest(payload)
    d.take(4).map(b => (b & 0xff).toFloat)
  }

  /** Feature extraction over a media DataFrame: partition-batched (the real
    * model call would amortize per batch exactly like EmbedOps), output =
    * fixed-dim float features per row. `decode` is the pluggable codec
    * seam: stubDecode by default, byteDecode for the oracle-gated path, a
    * real codec in production. */
  def extractFeatures(media: DataFrame, batchSize: Int = 32,
      decode: Array[Byte] => Array[Float] = stubDecode): DataFrame = {
    val schema = media.schema.add("features", ArrayType(FloatType))
    val idx = media.schema.fieldIndex("payload")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder/model would be invoked once
        val feats = batch.map(r => decode(r.getAs[Array[Byte]](idx)))
        batch.lazyZip(feats).map((r, f) => Row.fromSeq(r.toSeq :+ f.toSeq))
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling contract for video payloads: emits `n` (frame_idx,
    * frame_bytes) rows per video — the explode-shaped generator a real
    * decoder would feed. Stub frames are deterministic slices. */
  def sampleFrames(media: DataFrame, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions.{posexplode, transform => arrTransform}
    val frames = media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(arrTransform(sequence(lit(0), lit(n - 1)),
          i => concat(col("payload"),
            i.cast("string").cast("binary")))).as(Seq("frame_idx", "frame")))
    frames
  }

  /** Deterministic synthetic media table for tests/demos. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, rows: Int): DataFrame = {
    val data = (0 until rows).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      Row(i.toLong, kind, s"application/x-$kind",
        s"payload-$i".getBytes(StandardCharsets.UTF_8),
        Row(640 + i, 480 + i, 1000 * (i + 1)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.min(4, rows)), mediaSchema)
  }
}
