package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 made the Expression↔Column converters
  * `private[sql]` (classic/columnNodeSupport.scala); this shim lives in the
  * `org.apache.spark.sql` namespace solely to re-export the two needed
  * calls — the standard extension-library pattern, no Spark internals are
  * modified. */
object ColumnLift {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Non-blocking observation read (`Observation.getOrEmpty` is
    * `private[sql]`): empty map when the observed action hasn't run. */
  def observedOrEmpty(o: org.apache.spark.sql.Observation): Map[String, Any] =
    o.getOrEmpty
}
