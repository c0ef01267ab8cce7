package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface needed by a native-expression
  * library: Spark 4 moved `Column` onto ColumnNode and made the
  * Expression↔Column converters (`classic.ExpressionUtils`) and the
  * session's FunctionRegistry sql-private. Placing this one-file shim in
  * `org.apache.spark.sql` is the standard extension-library practice
  * (frameless, spark-daria, Sedona all ship the same bridge); everything
  * else in the engine stays in `graft.*` and uses only this object.
  */
object GraftSqlBridge {

  /** Wrap a Catalyst expression as a classic Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a classic Column to its Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a builder in the session's function registry (runtime path;
    * the config-time path is `graft.functions.GraftExtensions` via
    * `spark.sql.extensions`). Idempotent AND quiet: a function already
    * registered is left alone (createOrReplace would WARN on every call —
    * install() runs per query invocation). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry =
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(name, builder, "built-in")
  }

  /** Build a DataFrame over a raw logical plan (custom operators). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Clone the session: shared SparkContext/cache/listener bus, its OWN
    * SQLConf (initialized to a copy of the parent's). The isolation seam
    * Checkpoints.stage uses to compile AQE-off loop stages without its
    * conf pins ever being visible to other threads of the parent
    * session (`cloneSession` is sql-private; this is the sanctioned
    * bridge-package route, same as the rest of this file). */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Drop a registered function (test support for install() idempotency). */
  def dropFunction(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name))
}
