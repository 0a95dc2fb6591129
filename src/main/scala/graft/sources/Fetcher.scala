package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

/** Live-fetch seam for ingestion — S5's network half (SURVEY §4 O14). The
  * reference fetches each article URL with `requests.get` and throttles
  * between requests (airflow/dags/mlb_pipeline/pipeline.py:24-28, sleep(2)
  * at mlb_pipeline_dag.py:116). Network I/O is a nondeterministic effect,
  * so — exactly like [[graft.llm.LlmClient]] — the engine quarantines it
  * behind a trait: the pipeline is written against the seam, tests run the
  * deterministic fixture impl, production swaps in an HTTP client and
  * nothing else changes.
  */
trait Fetcher extends Serializable {
  /** Fetch a batch of URLs → page bodies; None = fetch failure (the
    * reference logs and skips failed articles). */
  def fetchBatch(urls: Seq[String]): Seq[Option[String]]
}

/** Deterministic fixture-backed fetcher: a URL→body map captured ahead of
  * time (zero-egress test environments; also the record/replay shape a
  * crawler integration test uses). Unknown URLs are fetch failures. */
final class FixtureFetcher(fixtures: Map[String, String]) extends Fetcher {
  override def fetchBatch(urls: Seq[String]): Seq[Option[String]] =
    urls.map(fixtures.get)
}

object FetchOps {
  /** Partition-batched, per-partition-throttled fetch: adds `outCol` with
    * the fetched body (null on failure). mapPartitions + grouped batching
    * per SURVEY §4 O10/O14 — and a `Thread.sleep` BETWEEN batches inside
    * each partition, which is the distributed form of the reference's
    * per-request sleep: with E executor slots the cluster-wide request
    * rate is bounded by E × batchSize / throttleMillis, tuned by
    * repartitioning the URL list rather than by any central coordinator
    * (no shuffle, no driver round-trips). */
  def fetchAll(df: DataFrame, urlCol: String, outCol: String,
      fetcher: Fetcher, batchSize: Int = 16,
      throttleMillis: Long = 0L): DataFrame = {
    // driver-side contract check — Iterator.grouped would otherwise throw
    // an opaque per-task error at execution time
    require(batchSize > 0, s"batchSize=$batchSize must be positive")
    require(throttleMillis >= 0, s"throttleMillis=$throttleMillis must be >= 0")
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(urlCol)
    df.mapPartitions { it =>
      var first = true
      it.grouped(batchSize).flatMap { batch =>
        if (!first && throttleMillis > 0) Thread.sleep(throttleMillis)
        first = false
        val bodies = fetcher.fetchBatch(batch.map(_.getString(idx)))
        // fail fast on a broken seam impl — lazyZip would silently DROP
        // rows if the fetcher returned fewer bodies than URLs
        require(bodies.size == batch.size,
          s"Fetcher returned ${bodies.size} bodies for ${batch.size} urls")
        batch.lazyZip(bodies).map((r, b) => Row.fromSeq(r.toSeq :+ b.orNull))
      }
    }(Encoders.row(schema))
  }
}
