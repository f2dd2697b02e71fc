package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * The `private[sql]` bridges the engine needs: turning a custom
 * [[LogicalPlan]] into a user-facing [[DataFrame]], and a raw Catalyst
 * [[Expression]] into a [[Column]] (for expressions that carry model
 * objects — e.g. a quantizer's centroid matrix — which cannot ride
 * through the name-based function registry). Spark exposes no public
 * constructor for either (every third-party plan-extension library ships
 * the same one-liners under `org.apache.spark.sql`), so they are
 * isolated here — nothing else in the codebase lives outside `graft`.
 */
object Shims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
