package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (X6's training loop — q110
  * computes round 1's statistic; this iterates count → merge → re-tokenize).
  *
  * Distributed shape: the corpus collapses once to the DISTINCT-word table
  * with counts (vocab-sized, cached — merges act on unique words, so no
  * round ever re-reads the corpus). Each round is ONE map-side-combinable
  * pair-count aggregation over that table plus a single-row argmax collect
  * (the merge rule — driver-held by design, it IS the output vocabulary).
  * Applying a merge is a narrow map, no shuffle.
  *
  * A word's segmentation is carried as a separator-wrapped string
  * (`|h||e||l||l||o|`): merging pair (l, r) is the literal replacement of
  * `|l||r|` with `|lr|`, whose leftmost-non-overlapping scan is exactly
  * BPE's single-pass greedy merge — and has identical semantics in Spark's
  * `replace` and DuckDB's, which is what lets an oracle replay the rounds
  * as statically unrolled SQL. Symbols never contain the separator
  * (callers tokenize natural text; the corpus alphabet is letters).
  */
object BpeTrainer {

  private val SEP = "|"

  /** Wrap a word's characters: "cat" → "|c||a||t|". */
  private def wrapChars(word: org.apache.spark.sql.Column) =
    concat(lit(SEP), array_join(split(word, ""), SEP + SEP), lit(SEP))

  /** Adjacent symbol pairs of a wrapped segmentation string. */
  private def pairsOf(seg: org.apache.spark.sql.Column) = {
    val syms = split(regexp_replace(seg, "^\\||\\|$", ""), "\\|\\|")
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** One merge rule: (step, left, right, merged, corpus-weighted count at
    * merge time). Driver-held by design — the merge list IS the trained
    * vocabulary, bounded by `rounds`. */
  final case class MergeRule(step: Int, left: String, right: String,
      merged: String, n: Long)

  /** Train `rounds` merge rules over whitespace-tokenized `textCol`.
    * Argmax tiebreak: (n desc, left, right). */
  def trainMerges(docs: DataFrame, textCol: String,
      rounds: Int): Seq[MergeRule] = {
    require(rounds >= 1 && rounds <= 1000, s"rounds=$rounds out of range")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(wrapChars(col("word")).as("s"), col("cnt"))
      .cache()
    try {
      var cur = words.select(col("s"), col("cnt"))
      val merges = Seq.newBuilder[MergeRule]
      var step = 1
      var dry = false
      while (step <= rounds && !dry) {
        // the only collect: the argmax pair — one row, the merge rule itself
        val top = cur.select(explode(pairsOf(col("s"))).as("p"), col("cnt"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).cast("long").as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) dry = true // no pairs left: later rounds can't differ
        else {
          val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += MergeRule(step, l, r, l + r, n)
          cur = cur.withColumn("s",
            replace(col("s"), lit(SEP + l + SEP + SEP + r + SEP),
              lit(SEP + l + r + SEP)))
          // the replace chain grows one node per round; cut the lineage
          // periodically so deep trainings neither replay every prior
          // round's replace per job nor build a rounds-deep plan
          if (step % 50 == 0) cur = cur.localCheckpoint(true)
        }
        step += 1
      }
      merges.result()
    } finally words.unpersist()
  }

  /** Merge-table form of [[trainMerges]]:
    * (step, pair_left, pair_right, merged, n). */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, rounds)
      .map(m => (m.step, m.left, m.right, m.merged, m.n))
      .toDF("step", "pair_left", "pair_right", "merged", "n")
  }

  /** Per-document BPE token count under a trained vocabulary, as a pure
    * column expression (no shuffle, no UDF): each word re-segments through
    * the merge chain, the document's count is the sum. What a packing /
    * budgeting stage runs with (q133) — token counts at 100 TB are a
    * narrow map over the corpus. */
  def tokenCountCol(text: org.apache.spark.sql.Column,
      merges: Seq[MergeRule]): org.apache.spark.sql.Column =
    graft.functions.BpeTokenCount(text, merges.map(m => (m.left, m.right)))

  /** The pre-round-9 composed formulation of [[tokenCountCol]], kept as
    * the spec's equivalence oracle for the native expression: the
    * per-word wrap-replace-split chain ran on Catalyst's interpreted
    * HOF path (~5 s per ×10 corpus pass — q133/q168 at 8.3×/5.7× the
    * DuckDB yardstick before the native form). */
  private[graft] def tokenCountColComposed(text: org.apache.spark.sql.Column,
      merges: Seq[MergeRule]): org.apache.spark.sql.Column = {
    def wordTokens(w: org.apache.spark.sql.Column) = {
      val seg = merges.foldLeft(wrapChars(w)) { (s, m) =>
        replace(s, lit(SEP + m.left + SEP + SEP + m.right + SEP),
          lit(SEP + m.merged + SEP))
      }
      size(split(regexp_replace(seg, "^\\||\\|$", ""), "\\|\\|"))
    }
    aggregate(split(text, " "), lit(0), (acc, w) => acc + wordTokens(w))
  }

  /** ENCODE with a trained vocabulary: apply the merge rules in training
    * order to the corpus and return corpus-wide token frequencies
    * (token, n). The merges chain as literal replaces on the distinct-word
    * table — a narrow map over vocab-sized data, no per-round shuffle;
    * the single count aggregation at the end is map-side combinable. This
    * is the production tokenize step a trained BPE vocab is FOR. */
  def encode(docs: DataFrame, textCol: String,
      merges: Seq[MergeRule]): DataFrame = {
    val wc = docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val seg = merges.foldLeft(wrapChars(col("word"))) { (s, m) =>
      replace(s, lit(SEP + m.left + SEP + SEP + m.right + SEP),
        lit(SEP + m.merged + SEP))
    }
    wc.select(explode(
        split(regexp_replace(seg, "^\\||\\|$", ""), "\\|\\|")).as("token"),
        col("cnt"))
      .groupBy(col("token")).agg(sum(col("cnt")).cast("long").as("n"))
  }
}
