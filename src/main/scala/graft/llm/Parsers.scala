package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text→structure parser surface (SURVEY.md §2.10 U1–U8): the reference's
  * agent-framework output parsers re-expressed as deterministic Scala
  * functions exposed as UDFs (plus two no-UDF expression compositions).
  * Formats follow FIXTURES.md §7 (observed reference emit formats).
  */
object Parsers {

  final case class NewsItem(headline: String, content: String, source: String)
  final case class Plan(topic: String, data_sources: String, agents: String,
      storylines: String, notes: String)

  /** U1/U2: HEADLINE:/CONTENT:/SOURCE: blocks separated by blank lines
    * (reference behavior: orchestrator.py:257-282). */
  def parseNewsItems(text: String): Seq[NewsItem] =
    text.split("\n\\s*\n").toSeq.flatMap { block =>
      val kv = block.linesIterator.flatMap { line =>
        val t = line.trim
        Seq("HEADLINE:", "CONTENT:", "SOURCE:").collectFirst {
          case p if t.toUpperCase.startsWith(p) =>
            p.dropRight(1) -> t.drop(p.length).trim
        }
      }.toMap
      if (kv.contains("HEADLINE"))
        Some(NewsItem(kv("HEADLINE"), kv.getOrElse("CONTENT", ""),
          kv.getOrElse("SOURCE", "")))
      else None
    }

  /** U3: section headers (ALL-CAPS line, or <50 chars ending ':') followed
    * by content lines → map (specialized_agents.py:180-205 shape). */
  def parseSections(text: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, StringBuilder]
    var current: Option[String] = None
    def isHeader(t: String): Boolean =
      t.nonEmpty && (
        (t.exists(_.isLetter) && t == t.toUpperCase && !t.startsWith("- ")) ||
        (t.endsWith(":") && t.length < 50))
    text.linesIterator.foreach { line =>
      val t = line.trim
      if (isHeader(t)) {
        val key = t.stripSuffix(":").trim
        current = Some(key)
        out.getOrElseUpdate(key, new StringBuilder)
      } else if (t.nonEmpty) current.foreach { k =>
        val sb = out(k)
        if (sb.nonEmpty) sb.append(" ")
        sb.append(t)
      }
    }
    out.map { case (k, v) => k -> v.toString }.toMap
  }

  /** U4: "- " bullet extraction, optional "FAN REACTIONS:" header
    * (orchestrator.py:308-335 shape). */
  def parseBullets(text: String): Seq[String] =
    text.linesIterator.map(_.trim)
      .filter(_.startsWith("- "))
      .map(_.drop(2).trim)
      .filter(_.nonEmpty)
      .toSeq

  /** U5: plan text → 5-field struct, split on the labeled sections
    * (orchestrator.py:201-248 shape, corrected elif semantics). */
  def parsePlan(text: String): Plan = {
    val labels = Seq("Topic:", "Data Sources:", "Agents:", "Storylines:", "Notes:")
    val found = scala.collection.mutable.Map.empty[String, String]
    var current: Option[String] = None
    val sb = new StringBuilder
    def flush(): Unit = current.foreach { k =>
      found(k) = sb.toString.trim; sb.clear()
    }
    text.linesIterator.foreach { line =>
      val t = line.trim
      labels.find(l => t.toLowerCase.startsWith(l.toLowerCase)) match {
        case Some(l) =>
          flush(); current = Some(l)
          sb.append(t.drop(l.length).trim)
        case None if t.nonEmpty && current.isDefined =>
          if (sb.nonEmpty) sb.append(" "); sb.append(t)
        case _ => ()
      }
    }
    flush()
    Plan(
      found.getOrElse("Topic:", ""),
      found.getOrElse("Data Sources:", ""),
      found.getOrElse("Agents:", ""),
      found.getOrElse("Storylines:", ""),
      found.getOrElse("Notes:", ""))
  }

  /** U8: html → (title, body): title = first <h1> text, body = all <p>
    * texts joined by " " (pipeline.py:29-32 semantics; regex-based since the
    * engine carries no HTML-parser dependency). */
  def htmlExtract(html: String): (String, String) = {
    def strip(s: String) = s.replaceAll("<[^>]*>", "").trim
    val h1 = "(?s)<h1[^>]*>(.*?)</h1>".r
      .findFirstMatchIn(html).map(m => strip(m.group(1))).getOrElse("No Title")
    val ps = "(?s)<p[^>]*>(.*?)</p>".r
      .findAllMatchIn(html).map(m => strip(m.group(1))).mkString(" ")
    (h1, ps)
  }

  // ---- Column-level wrappers ----

  val parseNewsItemsUdf = udf(parseNewsItems _)
  val parseSectionsUdf = udf(parseSections _)
  val parseBulletsUdf = udf(parseBullets _)
  val parsePlanUdf = udf(parsePlan _)
  val htmlExtractUdf = udf((h: String) => {
    val (t, b) = htmlExtract(h); Parsers.TitleBody(t, b)
  })
  final case class TitleBody(title: String, body: String)

  /** U6: TTS cleanup — drop separator-only lines ([*\-_=]{3,}), trim, join
    * with " " (pipeline.py:268-281) — pure expression composition, no UDF. */
  def formatScriptForTts(script: Column): Column =
    concat_ws(" ",
      filter(
        transform(split(script, "\n"), l => trim(l)),
        l => l =!= "" && !l.rlike("^[*\\-_=]{3,}$")))

  /** F7/F6: TTS text normalization (reference behavior: abbreviation
    * dictionary + ordinal split + bracket-section removal, config.py:224-241
    * and pipeline.py:234-256) — chained regexp_replace, no UDF. */
  def ttsNormalize(script: Column): Column = {
    val abbrevs = Seq(
      "MLB" -> "M L B", "HR" -> "home run", "RBI" -> "R B I",
      "ERA" -> "E R A", "AL" -> "A L", "NL" -> "N L")
    val expanded = abbrevs.foldLeft(script) { case (c, (k, v)) =>
      regexp_replace(c, s"\\b$k\\b", v)
    }
    // "3rd" -> "3 rd"; drop [bracketed] section markers
    regexp_replace(
      regexp_replace(expanded, "(\\d+)(st|nd|rd|th)", "$1 $2"),
      "\\[[^\\]]*\\]", "")
  }

  /** U7: plan struct → markdown (utils.py:26-52 shape) — expression only. */
  def formatPlanAsMarkdown(topic: Column, dataSources: Column, agents: Column,
      storylines: Column, notes: Column): Column =
    concat(
      lit("# Podcast Plan: "), topic, lit("\n\n## Data Sources\n"), dataSources,
      lit("\n\n## Agents\n"), agents, lit("\n\n## Storylines\n"), storylines,
      lit("\n\n## Notes\n"), notes)
}
