package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal package-placed shim: Spark 4 made Column↔Expression conversion
  * private[sql] (classic.ExpressionUtils), and third-party expression
  * libraries conventionally bridge it from inside the package. Only these
  * two conversions are exposed; nothing else reaches into internals.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
