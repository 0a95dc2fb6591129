package graft

import graft.operators.{Curation, CurationQueries, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the training-data curation operators (q90–q96); exact
  * value correctness is the DuckDB oracle gate. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf001)

  test("native word_ngram_hashes equals xxhash64 over the gram strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edge = Seq((1L, Some("a b c")), (2L, Some("a  b")), (3L, Some(" x")),
      (4L, Some("y ")), (5L, Some("")), (6L, Some("one")),
      (7L, Option.empty[String])).toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus); n <- Seq(1, 2, 3)) {
      val diff = df.select(
          graft.functions.WordNgramHashes(col("text"), n).as("a"),
          transform(graft.functions.WordNgrams(col("text"), n),
            g => xxhash64(g)).as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(diff == 0L, s"native vs composed gram hashes diverged (n=$n)")
    }
  }

  test("native bigram_hash_pairs equals the composed gh/w1h string form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edge = Seq((1L, Some("a b c")), (2L, Some("a  b")), (3L, Some(" x")),
      (4L, Some("y ")), (5L, Some("")), (6L, Some("one")),
      (7L, Option.empty[String])).toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus)) {
      // composed = the retired q162 formulation: gram strings exploded,
      // both hashes evaluated on strings — the native kernel must agree
      // bit-for-bit pair-by-pair (order included)
      val diff = df.select(
          graft.functions.BigramHashPairs(col("text")).as("a"),
          transform(graft.functions.WordNgrams(col("text"), 2),
            g => struct(xxhash64(g).as("gh"),
              xxhash64(substring_index(g, " ", 1)).as("w1h"))).as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(diff == 0L, "native vs composed bigram hash pairs diverged")
    }
  }

  test("native pii_scan equals the java-regex composition on counts and text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // edge strings probe the matcher corners: run-not-ending-at-@, double
    // @, digits inside the local part, phone overrun (5th digit), phone
    // at string edges, adjacent matches, empty/null
    val edge = Seq(
      Some("plain text no pii"), Some("a@b.c"), Some("ab@@cd"),
      Some("x a9.z@mail.example.com y"), Some("a@b"), Some("@a.b"),
      Some("555-12345 and 12345-6789"), Some("123-4567"), Some("99-9999"),
      Some("a@bc5@de"), Some("one@two.three four@five.six"),
      Some("555-1234555-1234"), Some(""), None,
      // phone counted on RAW but its digits are eaten by the email match
      // in the replace chain — the case that breaks single-pass fusions
      Some("123-4567a@b.cd"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        CurationQueries.withSyntheticPii(col("text"), col("doc_id"))
          .as("text"))
    for (df <- Seq(edge, corpus)) {
      val raw = col("text")
      val diff = df.select(
          graft.functions.PiiScan(raw).as("a"),
          when(raw.isNull, lit(null)).otherwise(struct(
            size(regexp_extract_all(raw,
              lit(CurationQueries.emailPattern), lit(0))).as("n_emails"),
            size(regexp_extract_all(raw,
              lit(CurationQueries.phonePattern), lit(0))).as("n_phones"),
            CurationQueries.piiScrub(raw).as("scrubbed"))).as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(diff == 0L, "native pii_scan diverged from the regex form")
    }
  }

  test("transitionScores: literal fast path == join path, bit for bit") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"), col("lang"))
    def rows(literalMax: Long) =
      Curation.transitionScores(corpus, carryCols = Seq("lang"),
          literalMax = literalMax)
        .collect().map(_.toSeq).toSet
    val lit0 = rows(literalMax = 0L)   // forces the distributed join plan
    val litBig = rows(literalMax = Curation.modelLiteralMax)
    assert(lit0.nonEmpty && lit0 == litBig,
      s"literal vs join scoring paths diverged (${lit0.size} vs ${litBig.size})")
  }

  test("native word_char_pairs matches the composed explode+transform form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val edge = Seq((1L, Some("aab  ab")), (2L, Some(" x")), (3L, Some("y ")),
      (4L, Some("")), (5L, Some("a b c")), (6L, Option.empty[String]),
      (7L, Some("abc")))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    def composed(df: org.apache.spark.sql.DataFrame) = {
      val cs = split(col("w"), "")
      val pairs = when(size(cs) >= 2,
        transform(sequence(lit(1), size(cs) - 1),
          i => concat(element_at(cs, i), element_at(cs, i + 1))))
        .otherwise(array().cast("array<string>"))
      df.select(col("doc_id"),
          explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
        .select(col("doc_id"), explode(pairs).as("pair"))
    }
    def native(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        explode(graft.functions.WordCharPairs(col("text"))).as("pair"))
    for (df <- Seq(edge, corpus)) {
      val a = native(df).groupBy("doc_id", "pair").count()
        .collect().map(_.toSeq).toSet
      val b = composed(df).groupBy("doc_id", "pair").count()
        .collect().map(_.toSeq).toSet
      assert(a == b, "native vs composed pair multisets diverged")
    }
  }

  test("native overlapping_chunks matches the composed slice+concat form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    val edge = Seq((1L, Some("a b c d e")), (2L, Some("a  b")),
      (3L, Some(" lead")), (4L, Some("trail ")), (5L, Some("")),
      (6L, Some("one")), (7L, Option.empty[String]),
      (8L, Some((1 to 150).map(i => s"w$i").mkString(" "))))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus); (sz, st) <- Seq((64, 48), (3, 2), (2, 2))) {
      def canon(c: org.apache.spark.sql.DataFrame) =
        c.select(col("doc_id"), col("chunk_id"), col("chunk_text"))
          .collect().map(_.toSeq).toSet
      val a = canon(Curation.chunk(df, sz, st))
      val b = canon(Curation.chunkComposed(df, sz, st))
      assert(a == b, s"native vs composed chunks diverged (size=$sz stride=$st)")
    }
  }

  test("native span scrub matches the composed HOF form bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    // the planted span makes grams cross-doc duplicated; empty/spacey docs
    // exercise the split(text,' ') empty-word semantics the kernel mirrors
    val planted = "p q r s t"
    val edge = Seq(
      (1L, s"a b $planted c d"), (2L, s"$planted"), (3L, s"x $planted y"),
      (4L, ""), (5L, "solo doc under gram width"), (6L, s"e  f $planted "),
      (7L, s" lead $planted"), (8L, planted + " " + planted),
      (9L, (1 to 40).map(_ => planted).mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus); (n, md) <- Seq((5, 2), (3, 2), (2, 3))) {
      def canon(c: org.apache.spark.sql.DataFrame) =
        c.collect().map(_.toSeq).toSet
      val a = canon(Curation.scrubDuplicatedSpans(df, n, md))
      val b = canon(Curation.scrubDuplicatedSpansComposed(df, n, md))
      assert(a == b, s"native vs composed span scrub diverged (n=$n minDocs=$md)")
      // the planted corpus must actually excise, or the equality is vacuous
      if (df eq edge)
        assert(a.exists(r => r(2).asInstanceOf[Long] < r(1).asInstanceOf[Long]),
          s"vacuous scrub case (n=$n minDocs=$md)")
    }
  }

  test("contamination literal, hash-join, and composed string paths agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    val planted = "alpha beta gamma delta epsilon"
    val edge = Seq(
      (1L, s"x y $planted z"), (2L, "short doc"), (3L, ""),
      (4L, s"$planted $planted"), (5L, "a b c d e f g"),
      (10L, s"$planted tail words here"), (20L, "a b c d e"))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    for (all <- Seq(edge, corpus)) {
      val train = all.filter(col("doc_id") % 10 =!= 0)
      val ev = all.filter(col("doc_id") % 10 === 0)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      val litPath = canon(Curation.contaminationCounts(train, ev, n = 5))
      val joinPath = canon(Curation.contaminationCounts(train, ev, n = 5,
        broadcastEval = true, evalLiteralMax = 0))
      val composed = canon(Curation.contaminationCountsComposed(train, ev, 5))
      assert(litPath == joinPath, "literal vs hash-join paths diverged")
      assert(joinPath == composed, "hash-space vs string paths diverged")
      assert(litPath.nonEmpty)
      // contaminated docs actually detected, or the equality is vacuous
      assert(litPath.exists(r => r(2).asInstanceOf[Long] > 0),
        "no contamination found — vacuous")
    }
  }

  test("contamination: eval docs never appear; ratios within (0,1]") {
    val rows = q("q90_contamination").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 != 0)
      val ratio = r.getAs[Double]("contam_ratio")
      assert(ratio >= 0.5 && ratio <= 1.0)
      assert(r.getAs[Long]("n_contam") <= r.getAs[Long]("n_sh"))
    }
  }

  test("stratified sample: deterministic across partitionings, rates bounded") {
    val a = q("q91_stratified_sample").collect().map(_.toSeq).toSet
    val b = q("q91_stratified_sample").collect().map(_.toSeq).toSet
    assert(a == b && a.size == 5)
    a.foreach { r =>
      val (total, sampled) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
      assert(sampled <= total && sampled > 0)
    }
  }

  test("pii scrub: no email/phone pattern survives redaction") {
    val docs = Tables.documents(spark, TestSpark.sf001)
    val raw = CurationQueries.withSyntheticPii(col("text"), col("doc_id"))
    val residual = docs.select(
      (size(regexp_extract_all(CurationQueries.piiScrub(raw),
        lit(CurationQueries.emailPattern), lit(0))) +
        size(regexp_extract_all(CurationQueries.piiScrub(raw),
          lit(CurationQueries.phonePattern), lit(0)))).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(residual == 0L)
    // and the pre-scrub text really contained both kinds
    val found = q("q92_pii_scrub")
      .filter(col("n_emails") >= 1 && col("n_phones") >= 1).count()
    assert(found == docs.count())
  }

  test("repetition: distinct <= total; a forced repeat scores high") {
    import spark.implicits._
    q("q93_repetition").collect().foreach { r =>
      assert(r.getAs[Int]("n_distinct") <= r.getAs[Int]("n_total"))
    }
    val forced = Seq((1L, Array.fill(20)("spam ham eggs").mkString(" ")))
      .toDF("doc_id", "text")
    // 20 copies of a 3-word phrase: nearly all 3-grams repeat
    val rep = CurationQueries.all.find(_.name == "q93_repetition").get
    // run the same expression shape directly on the forced frame
    val sg = graft.functions.WordNgrams(col("text"), 3)
    val ratio = forced.select(
      (lit(1.0) - size(array_distinct(sg)).cast("double") / size(sg)).as("r"))
      .head.getDouble(0)
    assert(ratio > 0.8, s"forced repetition ratio $ratio; query present: ${rep.name}")
  }

  test("seq packing: every doc in exactly one pack; token totals preserved") {
    val packed = q("q94_seq_packing")
    val docs = Tables.documents(spark, TestSpark.sf001)
    val nDocs = packed.agg(sum("n_docs")).head.getLong(0)
    assert(nDocs == docs.count())
    val pt = packed.agg(sum("toks")).head.getLong(0)
    val dt = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(pt == dt)
    // packs start at 0 per source and fill ≈ capacity except possibly the tail
    packed.groupBy("source").agg(min("pack").as("p0")).collect()
      .foreach(r => assert(r.getAs[Long]("p0") == 0L))
  }

  test("incremental dedup equals brute cross-split pairs and stays one-sided") {
    val all = Tables.documents(spark, TestSpark.sf001)
    val inc = q("q95_incremental_dedup").collect().map(_.toSeq).toSet
    val sgA = Dedup.shingleSets(all.filter(col("doc_id") % 5 =!= 4), 3)
      .toDF("da", "sga")
    val sgB = Dedup.shingleSets(all.filter(col("doc_id") % 5 === 4), 3)
      .toDF("db", "sgb")
    val j = graft.functions.TextFunctions.jaccard(col("sga"), col("sgb"))
    val brute = sgA.crossJoin(sgB).filter(j >= 0.5)
      .select(round(j, 4), col("da"), col("db"))
      .collect().map(_.toSeq).toSet
    assert(inc == brute)
    inc.foreach { r =>
      assert(r(1).asInstanceOf[Long] % 5 != 4) // da from corpus
      assert(r(2).asInstanceOf[Long] % 5 == 4) // db from batch
    }
  }

  test("chunking: full coverage, stride-64/48 lengths, stable ids") {
    val chunks = q("q97_doc_chunks").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = Tables.documents(spark, TestSpark.sf001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
    assert(chunks.size == docs.length)
    docs.foreach { d =>
      val n = d.getAs[Int]("n")
      val cs = chunks(d.getAs[Long]("doc_id")).sortBy(_.getAs[Int]("chunk_id"))
      assert(cs.length == (n - 1) / 48 + 1)
      assert(cs.map(_.getAs[Int]("chunk_id")).toSeq == cs.indices.toSeq)
      // chunk k covers tokens [48k+1, min(48k+64, n)] — full coverage, 16 overlap
      cs.foreach { c =>
        val k = c.getAs[Int]("chunk_id")
        assert(c.getAs[Int]("n_toks") == math.min(48 * k + 64, n) - 48 * k)
      }
    }
  }

  test("Curation API: chunker covers every token at other size/stride configs") {
    val docs = Tables.documents(spark, TestSpark.sf001)
    Seq((32, 32), (100, 70), (16, 8)).foreach { case (sz, st) =>
      val chunks = Curation.chunk(docs, size = sz, stride = st)
      // per doc: chunk count formula and total coverage
      val byDoc = chunks.groupBy("doc_id")
        .agg(count(lit(1)).as("c"), max(col("chunk_id")).as("maxid"))
        .join(docs.select(col("doc_id"),
          size(split(col("text"), " ")).as("n")), "doc_id")
        .collect()
      byDoc.foreach { r =>
        val (c, maxid, n) = (r.getAs[Long]("c"), r.getAs[Int]("maxid"), r.getAs[Int]("n"))
        assert(c == (n - 1) / st + 1, s"size=$sz stride=$st n=$n")
        assert(maxid == c - 1)
      }
    }
  }

  test("Curation API: packSequences respects custom capacity and order column") {
    val packed = Curation.packSequences(
      Tables.documents(spark, TestSpark.sf001), capacity = 100)
    // a doc's pack is its predecessor-cumsum div capacity: monotone per source
    val bad = packed
      .withColumn("prev_pack", lag(col("pack"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")))
      .filter(col("prev_pack").isNotNull && col("pack") < col("prev_pack"))
    assert(bad.count() == 0)
  }

  test("Curation API: hashSampled is a fixed permutation (rate bounds hold)") {
    import spark.implicits._
    val keys = (0L until 1000L).toDF("k")
    val kept = keys.filter(Curation.hashSampled(col("k"), lit(30))).count()
    // (k*2654435761)%100 over 1000 consecutive keys hits each residue 10x
    assert(kept == 300, s"expected exactly 300 of 1000 at rate 30, got $kept")
  }

  test("quality funnel: stages monotone, totals cover the corpus") {
    val rows = q("q99_quality_funnel").collect()
    val docs = Tables.documents(spark, TestSpark.sf001)
    assert(rows.map(_.getAs[Long]("n_total")).sum == docs.count())
    rows.foreach { r =>
      val (t, l, rep, k) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_len"),
        r.getAs[Long]("n_rep"), r.getAs[Long]("n_kept"))
      assert(t >= l && l >= rep && rep >= k && k >= 0)
    }
    // the dedup stage really drops something: corpus plants exact dups
    assert(rows.map(r => r.getAs[Long]("n_rep") - r.getAs[Long]("n_kept")).sum >= 0)
  }

  test("paragraph dedup: first occurrence kept, later copies scrubbed, exact dup empties") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g h x1 x2 x3 x4 x5 x6 x7 x8"), // two blocks, both first
      (2L, "a b c d e f g h y1 y2 y3 y4 y5 y6 y7 y8"), // block 0 dups doc 1
      (3L, "a b c d e f g h x1 x2 x3 x4 x5 x6 x7 x8")  // exact dup of doc 1
    ).toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(corpus, blockWords = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    assert(out(1L).getAs[Long]("n_removed") == 0)
    assert(out(1L).getAs[String]("scrubbed_fp") ==
      md5hex("a b c d e f g h x1 x2 x3 x4 x5 x6 x7 x8"))
    assert(out(2L).getAs[Long]("n_removed") == 1)
    assert(out(2L).getAs[String]("scrubbed_fp") ==
      md5hex("y1 y2 y3 y4 y5 y6 y7 y8"))
    assert(out(3L).getAs[Long]("n_removed") == 2)
    assert(out(3L).getAs[String]("scrubbed_fp") == md5hex(""))
  }

  test("paragraph dedup: corpus block counts add up; planted dups scrub") {
    val docs = Tables.documents(spark, TestSpark.sf001)
    val out = q("q105_paragraph_dedup")
    assert(out.count() == docs.count())
    val expected = docs.select(
      (((size(split(col("text"), " ")) - 1) / 8) + 1).cast("long").as("b"))
      .agg(sum("b")).head.getLong(0)
    assert(out.agg(sum("n_blocks")).head.getLong(0) == expected)
    // the corpus plants exact duplicates, so something must scrub
    assert(out.agg(sum("n_removed")).head.getLong(0) > 0)
  }

  test("leakage split: a source never straddles splits; all splits populated") {
    val docs = Tables.documents(spark, TestSpark.sf001)
      .withColumn("split", Curation.groupSplit(col("source")))
    val straddlers = docs.groupBy("source")
      .agg(countDistinct("split").as("k")).filter(col("k") =!= 1).count()
    assert(straddlers == 0)
    // deterministic: same assignment on re-run
    val a = docs.select("source", "split").distinct().collect().map(_.toSeq).toSet
    val b = Tables.documents(spark, TestSpark.sf001)
      .withColumn("split", Curation.groupSplit(col("source")))
      .select("source", "split").distinct().collect().map(_.toSeq).toSet
    assert(a == b)
    // over a wide synthetic key space the three labels all appear and the
    // proportions respect the 80/10/10 target within noise
    import spark.implicits._
    val wide = (0 until 3000).map(i => s"host$i.example").toDF("g")
      .select(Curation.groupSplit(col("g")).as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide.keySet == Set("train", "val", "test"))
    assert(wide("train") > 2000 && wide("val") > 100 && wide("test") > 100)
  }

  test("snapshot diff: statuses partition the key union; incremental batch = added+changed") {
    import spark.implicits._
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val neu = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta")).toDF("doc_id", "text")
    val d = Curation.snapshotDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(d == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
    // corpus-level: statuses cover old ∪ new exactly once
    val rows = q("q112_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, TestSpark.sf001)
    val nOld = docs.filter(col("doc_id") % 7 =!= 6).count()
    val nNew = docs.filter(col("doc_id") % 7 =!= 0).count()
    assert(rows.values.sum == nOld + rows("added"))
    assert(rows.values.sum == nNew + rows("removed"))
    assert(rows.keySet == Set("added", "removed", "changed", "unchanged"))
  }

  test("mix rebalance: smallest source keeps rate 100; sampled within bounds") {
    val rows = q("q113_mix_rebalance").collect()
    assert(rows.length == 20)
    val minToks = rows.map(_.getAs[Long]("n_toks")).min
    rows.foreach { r =>
      val (toks, rate, docs, sampled) = (r.getAs[Long]("n_toks"),
        r.getAs[Long]("rate"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_sampled"))
      assert(rate == math.max(1L, 100L * minToks / toks))
      assert(rate >= 1 && rate <= 100)
      assert(sampled <= docs)
      if (toks == minToks) assert(rate == 100 && sampled == docs)
    }
  }

  test("quantization: int8 range respected, extreme hit, checksum reproducible") {
    val rows = q("q96_embed_quantize").collect()
    assert(rows.length == Tables.embeddings(spark, TestSpark.sf001).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("qmax") <= 127 && r.getAs[Long]("qmin") >= -127)
      // the max-abs component quantizes to exactly ±127
      assert(r.getAs[Long]("qmax") == 127 || r.getAs[Long]("qmin") == -127)
    }
    // manual checksum for one vector
    val first = Tables.embeddings(spark, TestSpark.sf001)
      .orderBy("vec_id").select("vec_id", "embedding").head
    val v = first.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)
    val scale = v.map(math.abs).max
    val qv = v.map(x => (x * 127.0 / scale).toLong)
    val expect = qv.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
    val got = rows.find(_.getAs[Long]("vec_id") == first.getLong(0)).get
      .getAs[Long]("checksum")
    assert(got == expect)
  }

  test("cross-doc grams: planted mirror pair saturates; unique doc scores 0") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // mirrors doc 2
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),     // all grams unique
      (4L, "tiny doc")                                // < 5 words: no grams
    ).toDF("doc_id", "text")
    val rows = Curation.crossDocDupCounts(corpus, n = 5, minDocs = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"))).toMap
    assert(rows(1L) == (2L, 2L) && rows(2L) == (2L, 2L)) // every gram shared
    assert(rows(3L) == (3L, 0L))                         // none shared
    assert(!rows.contains(4L))                           // too short: absent
    // invariant on real data: 0 <= n_shared <= n_grams
    q("q134_cross_doc_grams").collect().foreach { r =>
      val (g, sh) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"))
      assert(sh >= 0 && sh <= g && g > 0)
      assert(r.getAs[Long]("dup_bp") == 10000 * sh / g)
    }
  }

  test("importance ratios: smoothing floors every bucket; target words raise their bucket") {
    import spark.implicits._
    val target = Seq((1L, "quality quality prose")).toDF("doc_id", "text")
    val raw = Seq((2L, "spam spam spam spam"), (3L, "quality text here"))
      .toDF("doc_id", "text")
    val l = Curation.importanceRatios(target, raw, "text", nB = 32)
    assert(l.length == 32)
    // every bucket defined and positive (add-one smoothing, never 0 or div0)
    assert(l.forall(_ > 0))
    // the 'quality' bucket (2 target hits, 1 raw hit) must outweigh the
    // 'spam' bucket (0 target hits, 4 raw hits)
    def bucket(w: String): Int = {
      var h = 0L
      w.foreach(c => h = (h * 31 + c.toLong) % 2147483647L)
      (h % 32).toInt
    }
    assert(l(bucket("quality")) > l(bucket("spam")))
    // fixed-point identity on the known counts: (2+1)<<20 / (1+1) and
    // (0+1)<<20 / (4+1)
    assert(l(bucket("quality")) == (3L * 1048576L) / 2L)
    assert(l(bucket("spam")) == 1048576L / 5L)
  }

  test("transition scores: repeated bigrams score lower; short docs absent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a b a b a b"),   // one dominant transition, highly predictable
      (2L, "p q r s t u v w"),   // every bigram unique
      (3L, "solo")               // 1 word: no bigrams, must be absent
    ).toDF("doc_id", "text")
    val rows = Curation.transitionScores(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bg"), r.getAs[Long]("score"))).toMap
    assert(!rows.contains(3L))
    assert(rows(1L)._1 == 7L && rows(2L)._1 == 7L)
    // doc 1's transitions repeat (c2 high) => lower inverse probability
    assert(rows(1L)._2 < rows(2L)._2)
    // exact fixed-point replay for doc 2: every bigram unique (c2=1),
    // every left word count 1; V = 11 distinct words (a b, p..w, solo)
    // s = ((1 + 11) << 20) / (1 + 1) per bigram, mean over 7 identical
    assert(rows(2L)._2 == (12L * 1048576L) / 2L)
  }
}
