package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters summary (the third mergeable sketch
  * family after HLL/q44 and CMS/q109): at most `k` (item, weight) counters
  * that answer "which items occur more than n/(k+1) times, roughly how
  * often" in ONE pass with O(k) state — no full groupBy, no shuffle of the
  * long-tail key space. Per-partition summaries merge associatively
  * (Agarwal et al., "Mergeable Summaries", PODS'12: add counters, then
  * subtract the (k+1)-th largest weight and drop non-positives), so the
  * sketch composes with Spark's partial aggregation exactly like a sum.
  *
  * Contract (q131 pins it against exact counts): estimates never exceed
  * the true count; the total undercount is at most n/(k+1); every item
  * with true count > n/(k+1) is present in the summary.
  *
  * 100 TB shape: the executor-side state is k counters per partial — the
  * vocabulary's long tail (the thing that makes exact word counts at
  * corpus scale expensive) never leaves the executors.
  */
final case class HeavyHitters(k: Int)
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
      Map[String, Long]] {
  require(k >= 1 && k <= 100000, s"k=$k out of range")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  // buffers mutate in place (the Aggregator contract allows returning the
  // mutated buffer): per-row updates are O(1) hash ops, not per-row
  // persistent-map copies, on the one object Spark keeps per partial
  override def zero: Buf = scala.collection.mutable.HashMap.empty

  override def reduce(b: Buf, item: String): Buf = {
    b.get(item) match {
      case Some(c) => b(item) = c + 1L
      case None if b.size < k => b(item) = 1L
      case None =>
        // classic MG step: a full table + an unseen item decrements
        // everything by one (charging the new item's count against k
        // existing ones keeps every estimate within n/(k+1) of truth)
        b.mapValuesInPlace((_, c) => c - 1L)
        b.filterInPlace((_, c) => c > 0L)
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (w, c) => a(w) = a.getOrElse(w, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest weight; ties with it drop to 0, so
      // at most k strictly-greater counters survive
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.mapValuesInPlace((_, c) => c - cut)
      a.filterInPlace((_, c) => c > 0L)
    }
    a
  }

  override def finish(r: Buf): Map[String, Long] = r.toMap

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  // structured (MapType) output so callers can explode the summary
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
