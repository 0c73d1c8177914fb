package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset, ExpressionUtils, SparkSession}

/** The minimal `private[sql]` bridge the engine needs to host a custom
  * Catalyst operator (graft.plans.TopKPerKey). Everything here is the
  * canonical seam every Spark extension library uses; nothing else from
  * Spark's internals is re-exported.
  *
  *  - `ofRows` wraps a constructed [[LogicalPlan]] back into a DataFrame
  *    (`Dataset.ofRows`, the single entry point for custom plan nodes);
  *  - `expression`/`column` convert between the public [[Column]] facade
  *    and the Catalyst [[Expression]] it denotes (Spark 4's Column wraps
  *    a ColumnNode, not an Expression — `ExpressionUtils` is the
  *    converter the classic Dataset implementation itself uses);
  *  - `plan` exposes a DataFrame's analyzed logical plan so an operator
  *    can splice it as a child.
  */
object GraftSqlShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Eager ColumnNode→Catalyst conversion. NOT `ExpressionUtils
    * .expression`, whose lazy `ColumnNodeExpression` wrapper survives
    * analysis when spliced into a custom operator's non-standard
    * expression slots (e.g. inside a SortOrder) and then fails task
    * serialization; the converter yields plain (possibly Unresolved*)
    * Catalyst expressions the analyzer resolves in any operator. */
  def expression(col: org.apache.spark.sql.Column): Expression =
    ColumnNodeToExpressionConverter(col.node)

  def column(e: Expression): org.apache.spark.sql.Column =
    ExpressionUtils.column(e)

  def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[Dataset[_]].queryExecution.analyzed
}
