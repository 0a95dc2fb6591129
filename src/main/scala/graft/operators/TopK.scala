package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-shrinking top-k per group.
  *
  * Spark's idiomatic group top-k (row_number window + filter, q07) shuffles
  * EVERY row to its group's partition before ranking — at 100 TB that's a
  * full-data exchange to keep k rows per group. This operator adds the
  * map-side prune Spark has for global top-k (TakeOrderedAndProject's
  * per-partition limit) but lacks per group: within each INPUT partition,
  * bounded per-group heaps keep only that partition's k best rows; only
  * survivors (≤ partitions·k per group, vs. the group's full row count)
  * enter the exchange, and the normal window ranking runs over them.
  *
  * Correctness is a pruning argument: a row not among its (partition,
  * group)'s top k cannot be among the group's global top k — some k rows in
  * that same partition+group beat it everywhere. q114's oracle pins the
  * equivalence: bit-identical output to the plain window form.
  *
  * Heap memory is bounded by (groups-per-partition)·k entries. Ordering is
  * (orderCol DESC, tiebreak ASC) with null order values ranked worst — the
  * same total order the window form uses, which makes ranks deterministic.
  */
object TopK {

  /** The map-side prune alone (exposed for testing): keeps each input
    * partition's k best rows per group. Not ranked yet. */
  private[graft] def partialPrune(df: DataFrame, groupCols: Seq[String],
      orderCol: String, tiebreak: String, k: Int): DataFrame = {
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(orderCol)
    val tIdx = schema.fieldIndex(tiebreak)
    // PriorityQueue dequeues its greatest element; make "greatest" = worst
    // kept row (smallest value; among equals, largest tiebreak), so the
    // head is always the eviction candidate.
    val worstFirst: Ordering[(Double, Long, Row)] =
      new Ordering[(Double, Long, Row)] {
        def compare(a: (Double, Long, Row), b: (Double, Long, Row)): Int = {
          val c = java.lang.Double.compare(b._1, a._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
    df.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[(Double, Long, Row)]]
      it.foreach { row =>
        val key: Seq[Any] = gIdx.map(row.get)
        val v = if (row.isNullAt(vIdx)) Double.NegativeInfinity
          else row.getAs[Number](vIdx).doubleValue()
        val t = row.getAs[Number](tIdx).longValue()
        val heap = heaps.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty(worstFirst))
        if (heap.size < k) heap.enqueue((v, t, row))
        else if (worstFirst.lt((v, t, row), heap.head)) {
          heap.dequeue(); heap.enqueue((v, t, row))
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }(Encoders.row(schema))
  }

  /** Top-k rows per group, ranked 1..k in column `rn` — identical output
    * to `row_number().over(Window.partitionBy(groupCols).orderBy(orderCol
    * DESC, tiebreak)) <= k`, but only pre-pruned survivors shuffle. */
  def perGroupPruned(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tiebreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tiebreak))
    partialPrune(df, groupCols, orderCol, tiebreak, k)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
