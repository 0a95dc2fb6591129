package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch perceptron: learns a linearly separable toy corpus, stays
  * integer-exact, and its feature expression matches a hand computation. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hashed count features match a driver-side recomputation") {
    val df = Seq((1L, "aa bb aa"), (2L, ""), (3L, "x")).toDF("id", "text")
    val got = df.select(col("id"),
        Classifier.hashedCounts(col("text"), 8).as("x"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def h(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483647L) % 8
    def counts(ws: Seq[String]): Seq[Long] =
      (0 until 8).map(b => ws.count(w => h(w) == b).toLong)
    assert(got(1L) == counts(Seq("aa", "bb", "aa")))
    assert(got(2L) == Seq.fill(8)(0L)) // split("") yields one empty token
    assert(got(3L) == counts(Seq("x")))
  }

  test("native hashed_word_counts is bit-identical to the composed HOF form") {
    // adversarial boundary shapes first: consecutive/leading/trailing
    // spaces (empty words), empty string, single word, null text
    val edge = Seq((1L, "a  b"), (2L, " lead"), (3L, "trail "),
      (4L, ""), (5L, "x"), (7L, "the same word the same word"))
      .toDF("id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id").as("id"), col("text"))
    for (df <- Seq(edge, corpus); nF <- Seq(8, 32)) {
      val diff = df.select(col("id"), col("text"),
          Classifier.hashedCounts(col("text"), nF).as("a"),
          Classifier.hashedCountsComposed(col("text"), nF).as("b"))
        .filter(not(col("a") <=> col("b")))
        .collect()
      assert(diff.isEmpty,
        s"native vs composed diverged (nF=$nF): ${diff.take(3).mkString("; ")}")
    }
    // null text: the native form nulls OUT (array-typed null), where the
    // composed form produced an array of nF null elements — same null
    // score downstream, but the cleaner shape is pinned here explicitly
    val nulls = Seq((6L, Option.empty[String])).toDF("id", "text")
      .select(Classifier.hashedCounts(col("text"), 8).as("a"))
      .collect()
    assert(nulls.head.isNullAt(0), "null text must yield a null feature array")
  }

  test("perceptron separates a label carried by one word") {
    // label = +1 iff the text contains the marker word; 200 docs of
    // filler words plus the marker on the positive half
    val rows = (0 until 200).map { i =>
      val filler = Seq("alpha", "beta", "gamma", "delta")(i % 4)
      val text = if (i % 2 == 0) s"$filler marker $filler" else s"$filler $filler"
      (i.toLong, text, if (i % 2 == 0) 1L else -1L)
    }
    val df = rows.toDF("doc_id", "text", "y")
    val (w, b) = Classifier.trainPerceptron(df, "text", "y", nF = 16, iters = 5)
    val acc = df.select(
        (Classifier.predExpr(Classifier.scoreExpr(
          Classifier.hashedCounts(col("text"), 16), w, b)) === col("y"))
          .cast("long").as("ok"))
      .agg(sum(col("ok"))).head.getLong(0)
    assert(acc == 200L, s"perceptron failed to separate: $acc/200 correct")
  }

  test("training is deterministic: same data, same rounds, same model") {
    val df = (0 until 50).map { i =>
      (i.toLong, s"w$i common ${if (i < 25) "pos" else "neg"}",
        if (i < 25) 1L else -1L)
    }.toDF("doc_id", "text", "y")
    val m1 = Classifier.trainPerceptron(df, "text", "y", nF = 16, iters = 3)
    val m2 = Classifier.trainPerceptron(
      df.repartition(7), "text", "y", nF = 16, iters = 3)
    assert(m1._1.toSeq == m2._1.toSeq && m1._2 == m2._2,
      "model must not depend on partitioning (integer sums are order-free)")
  }
}
