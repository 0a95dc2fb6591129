package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only index-SERVING scale rehearsal (not part of the driver
  * contract): builds the persisted FTS postings index (q181's fixture)
  * and the IVF-PQ vector index (q151's geometry) from a (replicated) SF
  * dir, then times FIXED probes against each — the serving-scale evidence
  * the round-10 verdict asked for at ×1000: probe walls must track the
  * probed posting/candidate lists (flat-or-declining as the corpus grows),
  * never the corpus, while the build side is the one honest corpus pass.
  * Prints one JSON line for side-by-side ×10 / ×100 / ×1000 runs
  * (recorded in bench/r11/).
  *
  * Usage: runMain graft.ProbeScale <sfDir> [w1 w2 w3]
  * (default phrase matches the driver corpus; pass "w40 w80 w120" for the
  * Zipfian-vocabulary corpora from tools/make_zipf.py)
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val phraseArg = if (args.length > 1) args.drop(1).toSeq else Seq.empty
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32", "graft-probescale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val base = TempDirs.scratchAtExit("probescale")

    // --- FTS postings index: q181's phrase served from the persisted,
    // term-bucket-pruned index (build once, probe repeatedly) ---
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val phrase = if (phraseArg.nonEmpty) phraseArg else Seq("big", "order", "scan")
    val nBuckets = 64
    val ftsPath = base.resolve("postings").toString
    val (_, ftsBuild) = time(operators.Fts.writePostingsIndex(
      operators.Fts.positionalPostings(docs, "doc_id", "text"),
      ftsPath, nBuckets = nBuckets))
    val ftsRuns = (1 to 6).map(_ => time(operators.Fts.phraseQuery(
      operators.Fts.loadPostings(spark, ftsPath, phrase, nBuckets = nBuckets),
      phrase).collect()))
    val ftsRows = ftsRuns.head._1.length

    // --- IVF-PQ vector index: q151's geometry (8 lists, m=8 k=16 books,
    // rerank 64) built over the full embeddings table, probed with a
    // fixed query vector ---
    val e = Tables.embeddings(spark, dir).cache()
    val nVecs = e.count()
    val qvec = e.filter(col("vec_id") === 1)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    val (cents, trainC) = time(operators.Similarity.ivfCentroids(
      e, "embedding", "vec_id", 8, 2))
    val (books, trainB) = time(operators.Pq.trainCodebooks(
      e, "embedding", "vec_id", m = 8, k = 16))
    val pqPath = base.resolve("ivfpq").toString
    val (_, pqBuild) = time(operators.IvfPq.writeIvfPqIndex(
      e, "embedding", "vec_id", cents, books, pqPath))
    val pqRuns = (1 to 6).map(_ => time(operators.IvfPq.probeIvfPqIndex(
      spark, pqPath, "embedding", "vec_id", qvec, 10, 0 until 8, books,
      rerank = 64).collect()))
    e.unpersist()

    println(f"""{"dir":"$dir","nDocs":$nDocs,"nVecs":$nVecs,""" +
      f""""ftsBuildSec":$ftsBuild%.2f,""" +
      f""""ftsProbeSec":${median(ftsRuns.drop(1).map(_._2))}%.3f,""" +
      f""""ftsProbeRows":$ftsRows,""" +
      f""""ivfTrainSec":${trainC + trainB}%.2f,""" +
      f""""ivfpqBuildSec":$pqBuild%.2f,""" +
      f""""ivfpqProbeSec":${median(pqRuns.drop(1).map(_._2))}%.3f}""")
    spark.stop()
  }
}
