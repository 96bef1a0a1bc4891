package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for library code to wrap a custom Catalyst Expression as a
  * public Column (ExpressionUtils is private[sql]; this shim lives inside
  * the sql package namespace solely to re-export the two converters —
  * the supported alternative is SparkSessionExtensions function
  * registration, which graft.GraftExtensions also provides). */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom LogicalPlan (Dataset.ofRows is
    * private[sql]) — the bridge for whole-operator extensions like
    * graft.plans.TopKPerKeyNode. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session planner's full strategy list (extension-injected +
    * experimental + built-in) — lets library code check whether a custom
    * strategy is already registered through EITHER path. */
  def plannerStrategies(spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.planner.strategies

  /** The MANAGED location the catalog would give a table of this name in
    * the current database (SessionCatalog is private[sql]) — respects
    * databases created with a custom LOCATION, unlike re-deriving the
    * path from the warehouse dir by naming convention. */
  def defaultTablePath(
      spark: org.apache.spark.sql.SparkSession, table: String): java.net.URI =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table))

}

/** Planner strategy for [[graft.plans.TopKPerKeyNode]]: partial heap →
  * (exchange placed by EnsureRequirements) → final heap. Lives in the
  * sql namespace because SparkStrategy is private[sql]; injected via
  * graft.GraftExtensions. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.execution.SparkPlan
  import graft.plans.{TopKPerKeyExec, TopKPerKeyNode}

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, so, k, child, mode) =>
      val partial = TopKPerKeyExec(keys, so, k, partial = true, planLater(child), mode)
      TopKPerKeyExec(keys, so, k, partial = false, partial, mode) :: Nil
    case _ => Nil
  }
}
