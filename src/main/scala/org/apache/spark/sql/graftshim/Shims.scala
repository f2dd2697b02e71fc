package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The one `private[sql]` bridge the engine needs: turning a custom
 * [[LogicalPlan]] into a user-facing [[DataFrame]]. Spark exposes no
 * public constructor for this (every third-party plan-extension library
 * ships the same one-liner under `org.apache.spark.sql`), so it is
 * isolated here — nothing else in the codebase lives outside `graft`.
 */
object Shims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
