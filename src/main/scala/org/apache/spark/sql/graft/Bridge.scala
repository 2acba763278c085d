package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ catalyst Expression bridge. Spark 4 made `ExpressionUtils` `private[sql]` as part
 * of the Connect Column refactor; libraries that add native Catalyst expressions hop through
 * an `org.apache.spark.sql` sub-package to reach it (the same trick Spark's own extensions
 * modules use). This is the only place graft touches a non-public Spark API.
 */
object Bridge {
  def column(e: Expression): Column    = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function builder on a live session (the runtime alternative to the
    * `spark.sql.extensions=graft.GraftExtensions` config path). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
