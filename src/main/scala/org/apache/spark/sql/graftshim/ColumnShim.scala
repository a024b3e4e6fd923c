package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions
  * (Spark 4 wraps Columns around ColumnNodes, not Expressions, so a
  * library exposing native Catalyst expressions as Columns needs this
  * one-hop shim in the org.apache.spark.sql namespace — the standard
  * pattern used by expression libraries). Kept to exactly these two
  * calls; everything else lives in graft.*. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
