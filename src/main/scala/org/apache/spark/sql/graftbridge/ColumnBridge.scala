package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the private[sql] Column ↔ Expression conversions
  * (Spark 4 moved Column onto ColumnNode; ExpressionUtils is the blessed
  * classic-backend bridge but is sql-private). Lives under the
  * org.apache.spark.sql namespace solely to satisfy that access scope —
  * the standard extension-library idiom for native expressions exposed as
  * Column helpers.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
