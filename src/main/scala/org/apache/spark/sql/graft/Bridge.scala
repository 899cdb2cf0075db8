package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge for custom expressions.
  *
  * Spark 4 split the public `Column` API from catalyst; the converters
  * live in `classic.ExpressionUtils`, which is `private[sql]`. This
  * standard extension-point shim (own jar, `org.apache.spark.sql`
  * subpackage) re-exposes just the two converters the graft expressions
  * need. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
