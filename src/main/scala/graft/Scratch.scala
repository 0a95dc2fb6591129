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
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32", "graft-scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, d)
    val sg = time("shingleSets count") {
      val x = Dedup.shingleSets(docs).cache(); x.count(); x
    }
    val sig = time("signatures") {
      val x = Dedup.minhashSignatures(sg, 32).cache(); x.count(); x
    }
    val numBands = 16
    val rowsPerBand = 2
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"h$i")): _*).as("bh"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .cache()
    time("bands count")(println("bands=" + bands.count()))
    val x = bands.toDF("da", "band", "bh")
    val y = bands.toDF("db", "band_y", "bh_y")
    val joined = x.join(y,
      col("band") === col("band_y") && col("bh") === col("bh_y") && col("da") < col("db"))
    joined.explain("formatted")
    time("join count")(println("joined=" + joined.count()))
    val xu = bands.toDF("da", "band", "bh")
    val yu = bands.toDF("db", "band", "bh")
    val usingJoined = xu.join(yu, Seq("band", "bh")).filter(col("da") < col("db"))
    time("using-join count")(println("ujoined=" + usingJoined.count()))
    spark.sparkContext.setLogLevel("INFO")
    time("using distinct count")(
      println("ucands=" + usingJoined.select("da", "db").distinct().count()))
    spark.sparkContext.setLogLevel("WARN")
    spark.stop()
  }
}
