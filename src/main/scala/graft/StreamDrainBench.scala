package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev-only streaming-maintenance throughput floor (r11 verdict #7): the
  * three persisted-index ingest loops (dedup q145, IVF-PQ ANN q154, FTS
  * q160) are correctness-gated by their oracles but were never TIMED — a
  * regression in foreachBatch/upsert overhead would be invisible. This
  * main runs each full drain (stage + 3 checkpointed micro-batches +
  * family upsert fold) at the given SF dir and prints one JSON line with
  * wall seconds, rows drained, and rows/s — recorded per round in
  * bench/r{N}/stream_drain.json as the pinned floor.
  *
  * rowsDrained is the total input rows across the drain's micro-batches
  * (q145/q160: the documents slices; q154: 1.5× the vector table — the
  * re-crawl slice re-delivers the evens), so rows/s measures the ingest
  * loop end-to-end: shingle/encode, probe, bucket routing, partition
  * rewrite, checkpoint commit.
  *
  * Usage: runMain graft.StreamDrainBench [sfDir]
  */
object StreamDrainBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32", "graft-streamdrain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = Tables.documents(spark, dir).count()
    val nVecs = Tables.embeddings(spark, dir).count()
    val loops = Seq(
      ("q145_stream_ingest_dedup", nDocs),
      ("q154_stream_ann_ingest", nVecs * 3 / 2),
      ("q160_stream_fts_ingest", nDocs + nDocs / 5))
    val rows = loops.map { case (name, drained) =>
      val t0 = System.nanoTime()
      val out = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      f"""{"loop":"$name","drainSec":$sec%.2f,"rowsDrained":$drained,""" +
        f""""rowsPerSec":${drained / sec}%.0f,"outputRows":$out}"""
    }
    println(s"""{"dir":"$dir","nDocs":$nDocs,"nVecs":$nVecs,""" +
      s""""loops":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
