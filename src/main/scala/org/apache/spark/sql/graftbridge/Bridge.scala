package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) `private[sql]`, so
  * libraries defining native Catalyst expressions need one file inside the
  * `org.apache.spark.sql` namespace to lift them into public API — the same
  * pattern every Spark extension library uses. Nothing else may live here. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
