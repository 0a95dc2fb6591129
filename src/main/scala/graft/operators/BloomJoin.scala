package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcast-Bloom semi-join pushdown: prune the fact table BEFORE the
  * shuffle join using a Bloom filter built from the (already filtered) dim
  * keys.
  *
  * This is the explicit form of the runtime row-level filtering Spark's
  * optimizer injects under `spark.sql.optimizer.runtime.bloomFilter.enabled`
  * — expressed as a library operator so a pipeline can apply it across
  * stage/job boundaries the optimizer can't see (e.g. a dim filtered in one
  * job, the fact scanned in the next), and so the pruning happens at the
  * scan side of the exchange rather than after it.
  *
  * Scale shape (the reason this exists): a fact-dim equi join shuffles the
  * ENTIRE fact table on the join key even when the filtered dim matches 1%
  * of it. The Bloom filter is built with one pass over the dim keys
  * (driver-held, like the IVF centroids — bounded: n·log2(1/fpp)·1.44 bits
  * ≈ 12 MB for 10M keys at 1% fpp, broadcastable), and the fact side drops
  * non-matching rows before the exchange, shrinking the shuffle by the join
  * selectivity. False positives are removed by the exact join that follows,
  * so the result is IDENTICAL to the plain join — q104's oracle is the
  * plain-join SQL, which gates exactly that. False negatives are impossible
  * by the Bloom contract.
  *
  * Reference behavior generalized: the reference joins its fact CSVs to
  * small filtered dims in full (hw5/load_csv.py joins game logs to teams);
  * at 100 TB the pre-join prune is what keeps that pattern runnable.
  */
object BloomJoin {

  /** Inner equi-join `fact ⋈ dim` on the shared column `key` (LongType),
    * pre-filtering fact rows through a Bloom filter of dim's keys.
    * Result is bit-identical to `fact.join(dim, Seq(key))`.
    *
    * `expectedItems` sizes the filter; overshooting only costs bits. The
    * membership probe is a broadcast-closure UDF — one hash per row against
    * an in-memory bitset; the codegen break is confined to the single
    * boolean filter and is repaid by the shuffle it prevents.
    */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(key, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    fact.filter(might(col(key))).join(dim, Seq(key))
  }
}
