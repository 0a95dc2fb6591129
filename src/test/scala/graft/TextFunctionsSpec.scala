package graft

import graft.functions.{TextFunctions, WordNgrams}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("WordNgrams equals the composed HOF shingle form on real docs") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val both = docs.select(
      WordNgrams(col("text"), 3).as("fast"),
      TextFunctions.shingles(TextFunctions.words(col("text")), 3).as("composed"))
    val diff = both.filter(col("fast") =!= col("composed")).count()
    assert(diff == 0)
  }

  test("WordNgrams edge cases: short text, exact n, empty tokens") {
    import spark.implicits._
    val df = Seq("one two", "a b c", "x  y").toDF("t") // "x  y" has empty token
    val got = df.select(WordNgrams(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq())
    assert(got(1) == Seq("a b c"))
    assert(got(2) == Seq("x  y")) // split(" ",-1) keeps the empty middle token
  }

  test("WordNgrams byte-level kernel matches String.split on multi-byte text") {
    import spark.implicits._
    // the kernel finds boundaries on raw bytes (0x20 never occurs inside a
    // UTF-8 multi-byte sequence) and slices grams from the original bytes;
    // multi-byte chars, leading/trailing/double spaces, and empty input
    // must all equal the decoded split(" ", -1) + space-join reference
    val cases = Seq("héllo wörld ünïcode テスト five",
      " leading", "trailing ", "dou  ble", "", "  ", "日本 語 テ キ スト")
    val got = cases.toDF("t").select(WordNgrams(col("t"), 2))
      .collect().map(_.getSeq[String](0))
    cases.zip(got).foreach { case (text, grams) =>
      val toks = text.split(" ", -1)
      val expect =
        if (toks.length < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(grams == expect, s"for <$text>")
    }
  }

  test("native expressions compile under codegen with fallback disabled") {
    // a doGenCode that emits broken Java silently degrades to interpreted
    // eval in normal runs; with fallback off, the compile error surfaces.
    // Inputs MUST be non-foldable and non-local: a Seq(...).toDF projection
    // is collapsed by ConvertToLocalRelation/ConstantFolding with
    // interpreted eval before any Java is generated (verified by sabotaging
    // doGenCode — the local-relation form still passed), so everything here
    // derives from spark.range's id column
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.range(1)
        .select(
          concat(lit("a b c "), col("id").cast("string")).as("t"),
          array((col("id") + 1).cast("float"), col("id").cast("float")).as("u"),
          (col("id") + 1).cast("double").as("nm"))
        .select(WordNgrams(col("t"), 2).as("g"),
          graft.functions.CosineSimilarity(col("u"), col("u")).as("sim"),
          graft.functions.Int8Quantize(col("u")).as("q"),
          graft.functions.LshBuckets(col("u"),
            Seq(Array(Array(1.0, -1.0), Array(-1.0, -1.0)),
              Array(Array(0.5, 0.5)))).as("b"),
          graft.functions.PqEncode(col("u"), col("nm"),
            Array(Array(Array(1.0, 0.0), Array(0.0, 1.0)))).as("pq"),
          graft.functions.NearestCentroid(col("u"),
            Array(Array(1.0, -1.0), Array(-1.0, -1.0))).as("nc"))
        .collect().head
      assert(r.getSeq[String](0) == Seq("a b", "b c", "c 0"))
      assert(r.getDouble(1) == 1.0)
      assert(r.getSeq[Byte](2) == Seq(127.toByte, 0.toByte))
      // u = [1.0, 0.0]: t0 planes → dots (1.0, -1.0) → bits (1, 0) = 1;
      // t1 plane → dot 0.5 ≥ 0 → 1
      assert(r.getSeq[Long](3) == Seq(1L, 1L))
      // PQ codebook [(1,0), (0,1)], norm 1: scores 1−0.5 vs 0−0.5 → code 0
      assert(r.getSeq[Int](4) == Seq(0))
      // centroids (1,-1)/(-1,-1): dots 1.0 / −1.0 → list 0
      assert(r.getInt(5) == 0)
      // a ragged (shorter-than-plane) embedding fails loudly instead of
      // reading past the array (nondeterministic buckets)
      val ragged = intercept[org.apache.spark.SparkException] {
        spark.range(1)
          .select(array(col("id").cast("float")).as("u1"))
          .select(graft.functions.LshBuckets(col("u1"),
            Seq(Array(Array(1.0, -1.0)))).as("b"))
          .collect()
      }
      assert(Option(ragged.getCause).map(_.toString).getOrElse(
        ragged.toString).contains("ragged"))
      // a null ELEMENT fails loudly too — the composed form folds it to
      // bit 0, interpreted eval NPEs, and unsafe-row codegen reads 0.0
      // (three behaviors for one input); `when` with no `otherwise`
      // yields a null float, keeping the array type float + containsNull
      val nullEl = intercept[org.apache.spark.SparkException] {
        spark.range(1)
          .select(array(col("id").cast("float"),
            when(col("id") > 100, lit(1.0f))).as("u2"))
          .select(graft.functions.LshBuckets(col("u2"),
            Seq(Array(Array(1.0, -1.0)))).as("b"))
          .collect()
      }
      assert(Option(nullEl.getCause).map(_.toString).getOrElse(
        nullEl.toString).contains("null"))
      // a non-float array (getFloat on 8-byte double slots would read
      // garbage halves) is rejected at ANALYSIS, not mis-bucketed at run
      val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
        spark.range(1)
          .select(array(col("id").cast("double")).as("u3"))
          .select(graft.functions.LshBuckets(col("u3"),
            Seq(Array(Array(1.0)))).as("b"))
          .collect()
      }
      assert(wrongType.getMessage.toLowerCase.contains("mismatch") ||
        wrongType.getMessage.contains("array<float>"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("jaccard of identical and disjoint sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")))
      .toDF("x", "y")
    val j = df.select(TextFunctions.jaccard(col("x"), col("y"))).collect().map(_.getDouble(0))
    assert(j(0) == 1.0 && j(1) == 0.0)
  }

  test("quality signals are integer-ratio exact") {
    import spark.implicits._
    val df = Seq("the cat sat").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.meanTokenLen(col("text")),
      TextFunctions.stopwordRatio(col("text"))).head
    assert(r.getInt(0) == 3)
    assert(r.getDouble(1) == 9.0 / 3)
    assert(r.getDouble(2) == 1.0 / 3)
  }
}
