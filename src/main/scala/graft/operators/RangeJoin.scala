package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: accelerates pure range conditions
  * (`l.ts BETWEEN r.lo AND r.hi`) that Catalyst can only plan as a
  * broadcast-nested-loop join — O(|L|·|R|) compares. Bucketing event time
  * into fixed-width bands turns the condition into an equi-join on the band
  * plus a residual filter: the left side maps to one band, the right side
  * replicates to the ceil(range/width)+1 bands its interval overlaps, and
  * the join shuffles on band value — O(|L| + |R|·k) with k small when the
  * band width matches the interval length.
  *
  * Results are exactly the rows of the naive theta join (RangeJoinSpec and
  * the q83 oracle assert this). At 100 TB this is the difference between a
  * shuffle join and an impossible cross product; the same shape serves
  * geo-binning (lat/lon grids) and numeric band joins.
  */
object RangeJoin {

  /** Inner join of `left` and `right` on
    * `leftTs BETWEEN rightLo AND rightHi` via time bands of `bandUs`
    * microseconds. Column names must be disjoint apart from the reserved
    * `__band`. */
  def bandedIntervalJoin(left: DataFrame, leftTs: String,
      right: DataFrame, rightLo: String, rightHi: String,
      bandUs: Long): DataFrame = {
    require(bandUs > 0)
    require(!left.columns.contains("__band") && !right.columns.contains("__band"),
      "bandedIntervalJoin reserves the __band column name")
    val l = left.withColumn("__band",
      floor(unix_micros(col(leftTs)) / bandUs))
    val r = right.withColumn("__band",
      explode(sequence(
        floor(unix_micros(col(rightLo)) / bandUs),
        floor(unix_micros(col(rightHi)) / bandUs))))
    l.join(r, Seq("__band"))
      .filter(col(leftTs) >= col(rightLo) && col(leftTs) <= col(rightHi))
      .drop("__band")
  }
}
