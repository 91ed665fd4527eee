package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column <-> catalyst Expression constructors
  * (Connect API unification); the supported internal path is
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql].
  * This bridge lives in a subpackage of org.apache.spark.sql purely to
  * re-export those two conversions to the graft package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
