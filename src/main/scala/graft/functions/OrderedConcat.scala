package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Ordered string-concat aggregation (SURVEY.md §2.5 A2 / §2.10 U9): the
  * reference's `"\n\n".join(docs)` depends on input order, but
  * `collect_list` order is partition-dependent — this Aggregator makes the
  * order explicit by carrying a sort key, so results are deterministic under
  * any parallelism. Buffers are merged pairwise (associative), then sorted
  * once at reduce — correct under Spark's partial aggregation.
  *
  * Usage: ds.groupBy(...).agg(OrderedConcat("\n\n").toColumn) over
  * (sortKey, value) pairs, or via the sort_array+collect_list composition in
  * RelationalQueries.q22 when the key is the value itself.
  */
final case class OrderedConcat(sep: String)
    extends Aggregator[(String, String), List[(String, String)], String] {
  override def zero: List[(String, String)] = Nil
  override def reduce(b: List[(String, String)], a: (String, String)): List[(String, String)] =
    a :: b
  override def merge(b1: List[(String, String)], b2: List[(String, String)]): List[(String, String)] =
    b1 ::: b2
  override def finish(r: List[(String, String)]): String =
    r.sortBy(_._1).map(_._2).mkString(sep)
  override def bufferEncoder: Encoder[List[(String, String)]] =
    Encoders.kryo[List[(String, String)]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
