package graft

import graft.functions.VectorFunctions
import graft.llm._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** L-layer: embedder determinism, stub LLM/TTS shape, RAG retrieval
  * semantics (golden replay of SURVEY.md §3.2). */
class LlmLayerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val embedder = new FeatureHashEmbedder(64)

  test("embedder: deterministic, unit-norm, fixed dim, batch==single") {
    val t = "power rankings phillies second"
    val a = embedder.embed(t)
    val b = embedder.embed(t)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    val batch = embedder.embedBatch(Seq(t, "other words"))
    assert(batch.head.toSeq == a.toSeq)
    // different text → different vector
    assert(embedder.embed("completely different tokens").toSeq != a.toSeq)
  }

  test("EmbedOps.embedText appends array<float> column, batched") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "document")
    val out = EmbedOps.embedText(df, "document", "embedding", embedder, batchSize = 1)
    assert(out.schema("embedding").dataType.typeName == "array")
    val norms = out.select(VectorFunctions.l2Norm(col("embedding"))).collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
  }

  test("stub llm + tts are deterministic and shaped") {
    val llm = new StubLlm
    val p = Seq("prompt one", "prompt two")
    assert(llm.completeBatch("answer", p) == llm.completeBatch("answer", p))
    assert(llm.completeBatch("sentiment", p).head.contains("- positive:"))
    val tts = new StubTts
    val audio = tts.synthesizeBatch(Seq("hello world"))
    assert(audio.head.length >= 16)
    assert(audio.head.toSeq == tts.synthesizeBatch(Seq("hello world")).head.toSeq)
  }

  test("LlmOps.complete runs partition-batched over a DataFrame") {
    import spark.implicits._
    val df = Seq(("a", "What happened?"), ("b", "Summarize this.")).toDF("id", "prompt")
    val out = LlmOps.complete(df, "answer", "prompt", "completion", new StubLlm)
    assert(out.count() == 2)
    assert(out.select("completion").collect().forall(_.getString(0).startsWith("[answer:")))
    val audio = LlmOps.synthesize(df, "prompt", "audio", new StubTts)
    assert(audio.select("audio").head.getAs[Array[Byte]](0).nonEmpty)
  }

  test("RAG golden replay: doc sharing query tokens ranks first") {
    import spark.implicits._
    val docs = Seq(
      ("u1", "the phillies rank second in the power rankings this week"),
      ("u2", "pitching rotations struggle in cold april weather"),
      ("u3", "farm system prospects impress scouts at spring training"))
      .toDF("id", "document")
    val rag = new RagPipeline(embedder, new StubLlm)
    val index = rag.buildIndex(docs)
    val top = rag.retrieve(index, "phillies power rankings second", k = 2)
    assert(top.head.getAs[String]("id") == "u1")
    val ans = rag.answer(index, "phillies power rankings second")
    assert(ans.startsWith("[answer:"))
    assert(ans == rag.answer(index, "phillies power rankings second")) // deterministic
    // empty index guard (P3)
    assert(rag.answer(index.filter(col("id") === "nope"), "q") == "No data available.")
  }

  test("L12 dispatch: plan-named agents run by name, unknown names skipped") {
    val planText =
      """Topic: Trade deadline fallout
        |Data Sources: game logs
        |Agents:
        |- FanReactionAgent
        |- MascotAgent
        |- NewsGatheringAgent
        |- FanReactionAgent
        |Storylines:
        |- Dodgers win streak
        |- Bullpen collapse
        |Notes: keep it under ten minutes""".stripMargin
    val llm = new StubLlm
    val out = AgentDispatch.executePlan(planText, llm)
    // exactly the known plan-named agents, in plan order, each once —
    // MascotAgent (unknown) skipped, the duplicate FanReactionAgent deduped,
    // GameAnalysisAgent (known but unnamed) NOT run: elif semantics
    assert(out.results.map(_._1) == Seq("fan_reactions", "news"))
    // the storyline list flows into the agents (two sentiment outputs)
    assert(out.results.toMap.apply("fan_reactions").linesIterator
      .count(_.startsWith("[sentiment:")) == 2)
    assert(out.results.toMap.apply("news").contains("News about: Dodgers win streak")
      || out.results.toMap.apply("news").startsWith("[summarize:"))
    assert(out.initialScript.startsWith("[generate:"))
    assert(out.finalScript.startsWith("[refine:"))
    // pure function of the plan text
    assert(AgentDispatch.executePlan(planText, llm) == out)
    // empty Agents section -> no agent runs, script still generates
    val bare = AgentDispatch.executePlan("Topic: quiet week\nAgents:\nNotes: n/a", llm)
    assert(bare.results.isEmpty && bare.finalScript.startsWith("[refine:"))
  }

  test("multi-turn agent loop: round 2 consumes round 1 output, FINAL stops early") {
    // scripted planner: round 1 names the news agent; round 2 must SEE the
    // news output in its scratchpad prompt and then names the analysis
    // agent; round 3 answers FINAL. Non-plan ops delegate to the stub so
    // the agents themselves stay deterministic.
    val stub = new graft.llm.StubLlm
    val planPrompts = scala.collection.mutable.ArrayBuffer.empty[String]
    val llm = new graft.llm.LlmClient {
      override def completeBatch(op: String, prompts: Seq[String]): Seq[String] =
        if (op != "plan") stub.completeBatch(op, prompts)
        else {
          planPrompts += prompts.head
          planPrompts.size match {
            case 1 => Seq("Topic: trade deadline\nAgents: NewsGatheringAgent\n" +
              "Storylines: big trade\nNotes: n/a")
            case 2 => Seq("Topic: trade deadline\nAgents: GameAnalysisAgent\n" +
              "Storylines: big trade\nNotes: n/a")
            case _ => Seq("FINAL: wrap it up")
          }
        }
    }
    val out = graft.llm.AgentDispatch.executeLoop("trade deadline", llm, maxRounds = 5)
    assert(out.stoppedEarly && out.finalOutput == "wrap it up")
    assert(out.rounds.map(_.map(_._1)) == Seq(Seq("news"), Seq("game_analysis")))
    assert(out.scratchpad.map(_._1) == Seq("news", "game_analysis"))
    // the re-plan threading: round-2's planner prompt carries round-1's
    // actual news output, round-3's carries both sections
    val newsOut = out.scratchpad.toMap.apply("news")
    assert(planPrompts(1).contains("## news") && planPrompts(1).contains(newsOut))
    assert(planPrompts(2).contains("## game_analysis"))
    assert(!planPrompts(0).contains("Intermediate results"))
    // cap-out path: a planner that never says FINAL stops at maxRounds and
    // generates from the gathered sections
    val never = new graft.llm.LlmClient {
      override def completeBatch(op: String, prompts: Seq[String]): Seq[String] =
        if (op != "plan") stub.completeBatch(op, prompts)
        else Seq("Topic: t\nAgents: NewsGatheringAgent\nStorylines: s\nNotes: n")
    }
    val capped = graft.llm.AgentDispatch.executeLoop("t", never, maxRounds = 2)
    assert(!capped.stoppedEarly && capped.rounds.size == 2)
    assert(capped.finalOutput.startsWith("[generate:"))
  }

  test("RAG upsert: same-id row replaced, new id appended (D2/D3)") {
    import spark.implicits._
    val rag = new RagPipeline(embedder, new StubLlm)
    val index = rag.buildIndex(Seq(("u1", "old text"), ("u2", "keep me")).toDF("id", "document"))
    val fresh = rag.buildIndex(Seq(("u1", "new text"), ("u9", "brand new")).toDF("id", "document"))
    val merged = rag.upsert(index, fresh)
    assert(merged.count() == 3)
    val u1 = merged.filter(col("id") === "u1").head.getAs[String]("document")
    assert(u1 == "new text")
  }
}
