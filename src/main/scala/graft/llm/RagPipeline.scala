package graft.llm

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RAG query path (SURVEY.md §3.2; reference pipeline.py:95-140):
  * embed query → cosine top-k over the index → "\n\n"-joined context →
  * templated prompt → LLM answer. The index is a plain DataFrame
  * (id, document, embedding) — vector-store semantics without an index
  * server; top-k plans as TakeOrderedAndProject.
  */
final class RagPipeline(embedder: Embedder, llm: LlmClient) extends Serializable {

  /** Build the index table from (id, document) rows — L1 embed + L3 exact
    * dedup by id (reference: delete-before-insert upsert). */
  def buildIndex(docs: DataFrame, idCol: String = "id",
      docCol: String = "document"): DataFrame =
    EmbedOps.embedText(
      docs.select(col(idCol).as("id"), col(docCol).as("document"))
        .dropDuplicates("id"),
      "document", "embedding", embedder)

  /** Upsert: new rows replace same-id rows (D2/D3 semantics: anti-join then
    * union — scripts/scrape_store_embed.py:79-86). */
  def upsert(index: DataFrame, newDocs: DataFrame): DataFrame =
    index.join(newDocs, Seq("id"), "left_anti").unionByName(newDocs)

  /** Top-k retrieval by cosine similarity (L2). */
  def retrieve(index: DataFrame, query: String, k: Int = 3): DataFrame = {
    val qv = array(embedder.embed(query).map(v => lit(v)): _*)
    index
      .withColumn("sim", VectorFunctions.cosineSim(col("embedding"), qv))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Context assembly (L5/A2): retrieval-ranked docs joined by "\n\n". */
  def assembleContext(topK: DataFrame): String =
    topK.orderBy(col("sim").desc, col("id"))
      .select(col("document"))
      .collect().map(_.getString(0)).mkString("\n\n")

  /** Full RAG answer (L6): k is tiny by construction so context assembly is
    * a k-row collect, mirroring the reference's driver-side prompt build. */
  def answer(index: DataFrame, query: String, k: Int = 3): String = {
    val context = assembleContext(retrieve(index, query, k))
    if (context.isEmpty) "No data available."
    else {
      val prompt =
        s"""You are an MLB analyst. Use the context to answer.
           |Context:
           |$context
           |Question: $query""".stripMargin
      llm.completeBatch("answer", Seq(prompt)).head
    }
  }
}
