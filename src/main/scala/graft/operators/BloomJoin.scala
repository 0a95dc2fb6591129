package graft.operators

import graft.functions.BloomContainsLong
import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.util.sketch.BloomFilter

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
  * Sizing is the whole game (the round-11 lesson): a filter sized below the
  * dim's true key count saturates — its false-positive rate drifts toward 1
  * and it prunes NOTHING while still charging the build pass and a per-row
  * probe. r11 measured exactly that: a 65k-item filter against a 30M-key
  * dim left q104 shuffling the full 630M records at ×1000. The filter is
  * therefore sized from `dim.count()` by default (one cheap combinable agg
  * over the dim — negligible next to the fact shuffle it buys back), and
  * when the required bits exceed `maxFilterBytes` the operator degrades to
  * the plain join rather than ship a saturated filter.
  *
  * Reference behavior generalized: the reference joins its fact CSVs to
  * small filtered dims in full (hw5/load_csv.py joins game logs to teams);
  * at 100 TB the pre-join prune is what keeps that pattern runnable.
  */
object BloomJoin extends Logging {

  /** Default cap on the serialized filter: 256 MB holds ~220M keys at 1%
    * fpp — past that the filter itself stops being broadcast-friendly and
    * the dim is no longer "selective" relative to a fact worth pruning. */
  val DefaultMaxFilterBytes: Long = 256L << 20

  /** Build the prune filter from the dim keys, or None when the dim's key
    * count would need more than `maxFilterBytes` of bits at `fpp` (a filter
    * forced under-bits saturates and prunes nothing — skip it instead).
    * `expectedItems <= 0` (the default path) sizes from `dim.count()`;
    * a positive value trusts the caller's estimate (floored at 1024 so a
    * micro-dim never gets a degenerate filter). */
  def buildFilter(dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double, maxFilterBytes: Long): Option[BloomFilter] = {
    val n = math.max(if (expectedItems > 0) expectedItems else dim.count(), 1024L)
    val bits = BloomFilter.optimalNumOfBits(n, fpp)
    if (bits > maxFilterBytes * 8) {
      logWarning(s"BloomJoin: ${n} expected keys need ${bits / 8 >> 20} MB " +
        s"> ${maxFilterBytes >> 20} MB budget; skipping prefilter (plain join)")
      None
    } else {
      // Spark 4 routes stat.bloomFilter through BloomFilterAggregate,
      // which SILENTLY clamps BOTH sizing inputs to the runtime-filter
      // confs: maxNumBits (default 2^26 = 8 MB -- saturated the 30M-key
      // r12 filter to fpp 0.95) and maxNumItems (default 4M -- with the
      // bits ceiling lifted, 30M keys clamped to 4M expected items got
      // numHashFunctions ~50, overfilling the filter to fpp 0.76). Raise
      // both for the build, restore after; the require is the tripwire
      // against any further silent clamp.
      val conf = dim.sparkSession.conf
      val keys = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" ->
          math.max(bits, 1L << 26).toString,
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" ->
          math.max(n, 1L << 22).toString)
      val prev = keys.map { case (k, _) => k -> conf.getOption(k) }
      keys.foreach { case (k, v) => conf.set(k, v) }
      try {
        val f = dim.stat.bloomFilter(key, n, fpp)
        require(f.bitSize() >= bits,
          s"bloom filter clamped to ${f.bitSize()} bits < optimal $bits " +
            s"for $n keys -- saturated filter prunes nothing")
        require(f.expectedFpp() <= math.max(fpp * 4, 0.05),
          f"bloom filter overfull: expectedFpp ${f.expectedFpp()}%.3f " +
            f"after inserting the dim keys (sizing clamped?)")
        Some(f)
      } finally prev.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  /** Inner equi-join `fact ⋈ dim` on the shared column `key` (LongType),
    * pre-filtering fact rows through a Bloom filter of dim's keys.
    * Result is bit-identical to `fact.join(dim, Seq(key))`.
    *
    * `expectedItems <= 0` (default) sizes the filter from `dim.count()`.
    * The membership probe is the codegen'd [[BloomContainsLong]]
    * expression — one hash per row inside the scan's whole-stage-codegen
    * span; the filter bytes ride the serialized plan.
    */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedItems: Long = -1L, fpp: Double = 0.01,
      maxFilterBytes: Long = DefaultMaxFilterBytes): DataFrame =
    buildFilter(dim, key, expectedItems, fpp, maxFilterBytes) match {
      case Some(bloom) =>
        fact.filter(BloomContainsLong(fact(key), bloom)).join(dim, Seq(key))
      case None =>
        fact.join(dim, Seq(key))
    }
}
