package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` function registry so graft's custom
  * expressions are callable from SQL text, not just the Column API.
  * Lives in an `org.apache.spark.sql` subpackage solely for access. */
object FunctionRegistrar {
  def registerTemp(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
