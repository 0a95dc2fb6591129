package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text scalar-function surface (SURVEY.md §2.8 F1–F11, F17; §2.10 U6 shape):
  * compositions of codegen'd built-ins only — no UDFs in the hot path, so the
  * whole pipeline stays inside whole-stage codegen at any scale.
  */
object TextFunctions {

  /** Whitespace tokenization (documents corpus is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles, 1-based windows matching the oracle's
    * `ws[i] || ' ' || ws[i+1] …` form. Guarded: Spark's `sequence(1, k)`
    * counts DOWN when k < 1, so short docs must short-circuit to []. */
  def shingles(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingle set per document — the single-pass
    * [[WordNgrams]] expression (same strings as `shingles(words(text), n)`,
    * asserted in tests, but ~10× faster than the interpreted HOF chain). */
  def shingleSet(text: Column, n: Int = 3): Column =
    array_distinct(WordNgrams(text, n))

  /** Jaccard similarity of two pre-distinct string sets. Integer-derived
    * doubles: |A∩B| / (|A|+|B|−|A∩B|) is bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Exact content fingerprint + order-insensitive vocabulary fingerprint
    * (SURVEY §2.9 L3 / north-star document fingerprinting). */
  def contentFingerprint(text: Column): Column = md5(text)
  def shingleFingerprint(text: Column, n: Int = 3): Column =
    md5(concat_ws(" ", sort_array(shingleSet(text, n))))

  /** Heuristic quality signals for a training-data pipeline: token count,
    * mean token length, stopword ratio. All integer-ratio doubles. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def tokenCount(text: Column): Column = size(words(text))

  def meanTokenLen(text: Column): Column = {
    val ws = words(text)
    aggregate(transform(ws, w => length(w)), lit(0),
      (acc, x) => acc + x).cast("double") / size(ws)
  }

  def stopwordRatio(text: Column): Column = {
    val ws = words(text)
    size(filter(ws, w => w.isInCollection(stopwords))).cast("double") / size(ws)
  }
}
