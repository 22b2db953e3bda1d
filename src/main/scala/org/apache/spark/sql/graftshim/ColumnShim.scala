package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between user-facing `Column` and Catalyst `Expression` for the
  * graft custom expressions.  Lives under `org.apache.spark.sql` because
  * Spark 4 scopes `ExpressionUtils` as `private[sql]` — same technique
  * used by public Spark extension libraries (Delta, Sedona, Qbeast).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
