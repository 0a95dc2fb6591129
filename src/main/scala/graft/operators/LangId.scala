package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification (north-star text-analysis op): score
  * each document against per-language stopword profiles and take the argmax.
  * Pure expression composition — stays in codegen, no UDF; the profile table
  * is a compile-time literal (a broadcast dim in a real deployment).
  *
  * Caveat: the synthetic documents corpus uses English-ish tokens with a
  * synthetic `lang` label, so accuracy there is meaningless; the operator is
  * validated on constructed samples in LangIdSpec.
  */
object LangId {

  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "con"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den"))

  /** Fraction of tokens found in `lang`'s stopword profile. */
  def score(words: Column, lang: String): Column =
    size(filter(words, w => w.isInCollection(profiles(lang))))
      .cast("double") / greatest(size(words), lit(1))

  /** Predicted language: argmax profile score, "und" (undetermined) when no
    * profile matches at all. */
  def predict(text: Column): Column = {
    val ws = split(lower(text), "\\s+")
    val scored = profiles.keys.toSeq.sorted.map { l =>
      struct(score(ws, l).as("s"), lit(l).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }
}
