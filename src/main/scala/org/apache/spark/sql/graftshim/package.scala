package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions for graft's
  * custom Catalyst expressions. Spark 4 made `Column` backend-agnostic
  * (ColumnNode), so first-party extensions reach the classic converter
  * through the sql package — the same route Spark's own connectors use.
  */
package object graftshim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
