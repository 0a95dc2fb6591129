package graft.llm

/** L12: the plan -> dispatch-by-name execution loop — the last partial from
  * SURVEY §2.9. The reference's orchestrator parses a production plan and
  * invokes ONLY the agents the plan names, each exactly once in plan order,
  * ignoring unknown names (the corrected elif-chain dispatch,
  * airflow/dags/agent_framework/orchestrator2.py:249-293 — its first
  * orchestrator ran every agent unconditionally); it then generates an
  * initial script from the gathered sections and refines it with the plan's
  * production notes.
  *
  * Re-expressed over the engine's deterministic LLM seam ([[LlmClient]]):
  * each named agent is one batched `completeBatch` op, so with [[StubLlm]]
  * the whole loop is a pure function of the plan text — asserted end to end
  * in LlmLayerSpec. The driver-side loop is intentionally NOT distributed:
  * a plan names at most a handful of agents (it is orchestration, not
  * data); the data-parallel work lives inside what the agents call (RAG
  * retrieval, mart queries, LlmOps.complete over tables).
  */
object AgentDispatch {

  /** Agent registry: name -> (results key, op runner). Adding an agent is
    * one entry — the dispatch loop never changes. */
  type Agent = (Parsers.Plan, Seq[String], LlmClient) => String

  val registry: Map[String, (String, Agent)] = Map(
    "NewsGatheringAgent" -> (("news", (plan: Parsers.Plan, storylines: Seq[String], llm: LlmClient) =>
      llm.completeBatch("summarize",
        storylines.map(s => s"News about: " + s)).mkString("\n"))),
    "GameAnalysisAgent" -> (("game_analysis", (plan: Parsers.Plan, _: Seq[String], llm: LlmClient) =>
      llm.completeBatch("answer",
        Seq("Analyze recent games relevant to: " + plan.topic)).head)),
    "FanReactionAgent" -> (("fan_reactions", (_: Parsers.Plan, storylines: Seq[String], llm: LlmClient) =>
      llm.completeBatch("sentiment", storylines).mkString("\n"))))

  /** Split a parsed plan section into its bullet items. parsePlan joins the
    * section's lines with spaces, so bulleted lines arrive as "- a - b";
    * inline lists as "a, b". Split on both separators, preserving
    * multi-word items. */
  def sectionItems(section: String): Seq[String] =
    section.split(" - |,").toSeq
      .map(_.trim.stripPrefix("- ").trim)
      .filter(_.nonEmpty)

  final case class DispatchResult(
      results: Seq[(String, String)], // (results key, agent output), plan order
      initialScript: String,
      finalScript: String)

  /** Execute a plan end to end: dispatch named agents -> generate -> refine. */
  def executePlan(planText: String, llm: LlmClient): DispatchResult = {
    val plan = Parsers.parsePlan(planText)
    val storylines = sectionItems(plan.storylines)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    sectionItems(plan.agents).foreach { name =>
      registry.get(name) match {
        case Some((key, run)) if !results.contains(key) =>
          results(key) = run(plan, storylines, llm)
        case _ => () // unknown agent names are skipped, duplicates run once
      }
    }
    val gathered = results.map { case (k, v) => "## " + k + "\n" + v }.mkString("\n")
    val initial = llm.completeBatch("generate",
      Seq("Write a podcast script about " + plan.topic + ".\n" + gathered)).head
    val refined = llm.completeBatch("refine",
      Seq(initial + "\nEdit notes: " + plan.notes)).head
    DispatchResult(results.toSeq, initial, refined)
  }
}
