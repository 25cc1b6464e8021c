package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge for Spark 4.x, where the unified Column wraps
 * a ColumnNode and the classic converters are private[sql]. Same approach as
 * public Catalyst-extension projects (cf. SNIPPETS.md [1], Qbeast's
 * DatasetFactory in package org.apache.spark.sql).
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
