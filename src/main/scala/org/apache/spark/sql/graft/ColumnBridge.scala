package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 made `ExpressionUtils` (the only supported way to wrap a custom
  * Catalyst Expression into a user-facing `Column`) `private[sql]`, so —
  * like every library that ships native expressions (Delta, Sedona, etc.)
  * — we expose it through a one-file shim living under the
  * `org.apache.spark.sql` namespace. Nothing else in this repo lives
  * outside the `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
