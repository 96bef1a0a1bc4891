package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for library code to wrap a custom Catalyst Expression as a
  * public Column (ExpressionUtils is private[sql]; this shim lives inside
  * the sql package namespace solely to re-export the two converters —
  * the supported alternative is SparkSessionExtensions function
  * registration, which graft.GraftExtensions also provides). */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
