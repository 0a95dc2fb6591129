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

  final case class LoopResult(
      rounds: Seq[Seq[(String, String)]], // per round: (results key, output)
      scratchpad: Seq[(String, String)],  // cumulative, latest value per key
      finalOutput: String,
      stoppedEarly: Boolean)              // planner said FINAL before the cap

  /** Multi-turn plan → execute → RE-PLAN loop (the reference's
    * AgentExecutor.invoke iteration, orchestrator.py:140-181: the model
    * proposes tool calls, tools run, their outputs return to the model as
    * the scratchpad, and the loop repeats until a final answer or the
    * iteration cap). Re-expressed over the deterministic seam: each round
    * the planner op sees the topic plus every intermediate result gathered
    * so far, and answers either `FINAL: <output>` (stop) or a plan text
    * whose named agents are dispatched exactly like [[executePlan]] —
    * their outputs joining the scratchpad the NEXT round's planner
    * consumes. Bounded by maxRounds (AgentExecutor's max_iterations); on
    * cap-out the final output is generated from the gathered sections,
    * mirroring the single-pass generate step. Driver-side by design, like
    * executePlan: plans name a handful of agents; the data-parallel work
    * lives inside what the agents call. */
  def executeLoop(topic: String, llm: LlmClient,
      maxRounds: Int = 3): LoopResult = {
    require(maxRounds > 0, s"maxRounds=$maxRounds must be positive")
    val scratchpad = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    def gathered =
      scratchpad.map { case (k, v) => "## " + k + "\n" + v }.mkString("\n")
    var round = 0
    while (round < maxRounds) {
      val prompt =
        if (scratchpad.isEmpty) s"Plan podcast production about: $topic"
        else s"Plan podcast production about: $topic\n" +
          s"Intermediate results so far:\n$gathered\n" +
          "Answer FINAL: <output> if done, or a revised plan."
      val planText = llm.completeBatch("plan", Seq(prompt)).head
      if (planText.trim.startsWith("FINAL:"))
        return LoopResult(rounds.toSeq, scratchpad.toSeq,
          planText.trim.stripPrefix("FINAL:").trim, stoppedEarly = true)
      val plan = Parsers.parsePlan(planText)
      val storylines = sectionItems(plan.storylines)
      val ran = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val seenThisRound = scala.collection.mutable.Set.empty[String]
      sectionItems(plan.agents).foreach { name =>
        registry.get(name) match {
          case Some((key, run)) if seenThisRound.add(key) =>
            val out = run(plan, storylines, llm)
            scratchpad(key) = out // later rounds may re-run a key: latest wins
            ran += key -> out
          case _ => () // unknown names skipped, same-round duplicates run once
        }
      }
      rounds += ran.toSeq
      round += 1
    }
    // iteration cap without FINAL: close out from what was gathered
    val fin = llm.completeBatch("generate",
      Seq(s"Write a podcast script about $topic.\n$gathered")).head
    LoopResult(rounds.toSeq, scratchpad.toSeq, fin, stoppedEarly = false)
  }
}
