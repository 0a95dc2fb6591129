package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main for stage-level profiling (not part of the contract). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[8]"), "8", "graft-scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // q84 vs q45 parity at sf0.01 (the driver's verify SF)
    val d01 = "/root/testdata/sf0.01"
    val e01 = Tables.embeddings(spark, d01)
    val brute = time("q45 brute sf0.01") {
      graft.operators.AdvancedQueries.all.find(_.name == "q45_embedding_neardup").get
        .run(spark, d01).collect().map(_.toString).sorted.toSeq
    }
    val lsh = time("q84 lsh sf0.01") {
      Dedup.embeddingDupPairs(e01, "embedding", "vec_id").collect().map(_.toString).sorted.toSeq
    }
    println(s"sf0.01 brute=${brute.size} lsh=${lsh.size} equal=${brute == lsh}")

    // recall stress: threshold 0.4 at sf0.001 → 66 true pairs near threshold
    val d001 = "/root/testdata/sf0.001"
    val e001 = Tables.embeddings(spark, d001)
    val a = e001.select(col("vec_id").as("da"), col("embedding").as("ea"))
    val b = e001.select(col("vec_id").as("db"), col("embedding").as("eb"))
    val sim = graft.functions.CosineSimilarity(col("ea"), col("eb"))
    val brute04 = a.join(b, col("da") < col("db")).filter(sim >= 0.4)
      .select(round(sim, 4).as("simr"), col("da"), col("db"))
      .collect().map(_.toString).sorted.toSeq
    for (chunks <- Seq(8, 16)) {
      val l = Dedup.embeddingDupPairs(e001, "embedding", "vec_id",
        threshold = 0.4, numPlanes = 16, numChunks = chunks)
        .collect().map(_.toString).sorted.toSeq
      println(s"sf0.001 t=0.4 chunks=$chunks brute=${brute04.size} lsh=${l.size} equal=${brute04 == l}")
    }
    // candidate-count selectivity report at defaults
    spark.stop()
  }
}
