package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. Spark 4 made these converters
  * `private[sql]`, so extension libraries host a forwarder inside an
  * `org.apache.spark.sql` subpackage (the pattern used by public Spark
  * extension projects, e.g. connectors that define native expressions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
