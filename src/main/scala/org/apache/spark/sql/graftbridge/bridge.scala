package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column ↔ Expression
  * converters, needed to expose custom Catalyst expressions (e.g.
  * graft.functions.UnicodeNormalize) as public `Column` functions on
  * Spark 4 (where `new Column(expr)` is no longer public API).
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — used by optimizer rules that rebuild a subplan
    * with the public DataFrame API. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
  }

  /** Apply the function injections collected by a
    * `SparkSessionExtensions` instance to a session's registry —
    * `spark.sql.extensions` is a STATIC conf read at SparkContext
    * creation, so tests sharing one context drive the (private[sql])
    * application step through this hook instead. */
  def applyFunctionExtensions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    ext.registerFunctions(spark.sessionState.functionRegistry)
  }

  /** Register a Catalyst expression builder as a SQL function. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
