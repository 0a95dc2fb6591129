package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Every native literal-table expression must compile under
  * GenerateUnsafeProjection DIRECTLY — no CodeGeneratorWithInterpretedFallback
  * to paper over a janino syntax error. This is the path the
  * production-geometry WholeStageCodegen gate does NOT cover: the two
  * render paths apply Block.toString's stripMargin a different number of
  * times, so a generated line whose content starts with `|` (e.g. a
  * condition continued onto a new line starting with `||`) survives one
  * path and is margin-eaten on the other — the round-8 NearestCentroid
  * regression (`')' expected instead of 'java'`) compiled fine in
  * WholeStageCodegen and fell back to interpreted eval in every
  * UnsafeProjection context (localCheckpoint, shuffle writers). House
  * rule for doGenCode templates: never begin a generated line with `|`;
  * put trailing operators at line END. */
class CodegenReproSpec extends AnyFunSuite {

  private val dim = 64
  private def emb = BoundReference(0, ArrayType(FloatType), nullable = true)
  private def norm = BoundReference(1, DoubleType, nullable = true)

  private def mustCompile(name: String, e: Expression): Unit =
    // throws CompileException on a generated-code syntax error
    GenerateUnsafeProjection.generate(Seq(e))

  test("NearestCentroid compiles as a bare UnsafeProjection at IVF geometry") {
    val cents = Array.tabulate(8)(i => Array.tabulate(dim)(d =>
      math.sin(i * 31 + d).toDouble))
    mustCompile("nearest_centroid", graft.functions.NearestCentroid(emb, cents))
  }

  test("PqEncode compiles as a bare UnsafeProjection at PQ geometry") {
    val books = Array.tabulate(8)(j => Array.tabulate(16)(c =>
      Array.tabulate(dim / 8)(d => math.cos(j * 17 + c * 3 + d).toDouble)))
    mustCompile("pq_encode", graft.functions.PqEncode(emb, norm, books))
  }

  test("LshBuckets compiles as a bare UnsafeProjection at mLSH geometry") {
    val planeSets = (0 until 8).map(t =>
      graft.operators.Similarity.hyperplanes(dim, 16, seed = 7L + t)).toArray
    mustCompile("lsh_buckets", graft.functions.LshBuckets(emb, planeSets))
  }

  test("HashedWordCounts compiles as a bare UnsafeProjection at classifier geometry") {
    val text = BoundReference(2,
      org.apache.spark.sql.types.StringType, nullable = true)
    for (nF <- Seq(16, 32, 1024))
      mustCompile("hashed_word_counts",
        graft.functions.HashedWordCounts(text, nF))
  }

  test("BpeTokenCount and WordCharPairs compile as bare UnsafeProjections") {
    val text = BoundReference(2,
      org.apache.spark.sql.types.StringType, nullable = true)
    val merges = Array(Array("a", "b"), Array("ab", "c"), Array("d", "e"))
    mustCompile("bpe_token_count",
      graft.functions.BpeTokenCount(text, merges))
    mustCompile("word_char_pairs", graft.functions.WordCharPairs(text))
    mustCompile("overlapping_chunks",
      graft.functions.OverlappingChunks(text, 64, 48))
    val positions = BoundReference(3,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType), nullable = true)
    mustCompile("selected_word_blocks",
      graft.functions.SelectedWordBlocks(text, positions, 8))
    mustCompile("word_ngram_hashes",
      graft.functions.WordNgramHashes(text, 2))
    mustCompile("bigram_hash_pairs", graft.functions.BigramHashPairs(text))
    val keys = Array.tabulate(961)(i => i.toLong * 7919 - 400000)
    val vals = Array.tabulate(961)(i => (i.toLong * 31 + 5) << 18)
    mustCompile("bigram_map_score",
      graft.functions.BigramMapScore(text, keys, vals))
    mustCompile("pii_scan", graft.functions.PiiScan(text))
    mustCompile("scrub_covered_words",
      graft.functions.ScrubCoveredWords(text, positions, 5))
    val evalHs = Array.tabulate(4096)(i => i.toLong * 104729 - 100000000)
    mustCompile("contam_counts",
      graft.functions.ContamCounts(text, evalHs, 5))
  }
}
