package org.apache.spark.sql
package graft

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 scopes `ExpressionUtils` (and the
  * pre-4 `Column(expr)` constructor) to `private[sql]`; custom native
  * expressions need exactly these two conversions, so this object lives in
  * the sql package to re-export them — the standard extension-library
  * pattern.
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom logical plan (`Dataset.ofRows` is
    * `private[sql]`) — the construction path for whole-operator extension
    * nodes like [[graft.plans.AsOfJoinPlan]]. */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a frame (children for custom nodes). */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** The RDDs a (local)checkpoint'ed frame reads from (`LogicalRDD` is
    * `private[sql]`) — the handle needed to unpersist a dead checkpoint
    * generation's executor blocks in iterative algorithms. */
  def backingRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    analyzed(df).collect { case lr: execution.LogicalRDD => lr.rdd }

  /** Idempotently register an extra planner strategy on a live session —
    * the runtime fallback for sessions built without
    * `withExtensions(new GraftExtensions)`. */
  def addStrategy(spark: SparkSession, s: execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** `SparkListenerSQLExecutionEnd` carries the QueryExecution, duration
    * and failure of the finished action in `private[sql]` vars — exactly
    * what an executionId-keyed metrics listener needs. */
  def endQe(e: execution.ui.SparkListenerSQLExecutionEnd): execution.QueryExecution = e.qe
  def endDurationNs(e: execution.ui.SparkListenerSQLExecutionEnd): Long = e.duration
  def endFailed(e: execution.ui.SparkListenerSQLExecutionEnd): Boolean =
    e.executionFailure.isDefined || e.errorMessage.exists(_.nonEmpty)
}
