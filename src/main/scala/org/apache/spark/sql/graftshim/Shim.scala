package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark-internal (`private[sql]`) Column↔Expression plumbing,
  * hosted under the org.apache.spark.sql namespace as extension libraries
  * conventionally do. Everything used here is plain Apache Spark API.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
