package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Narrow bridge to the one `private[sql]` entry point the planner
  * rules need: turning a Catalyst [[LogicalPlan]] SUBTREE back into an
  * executable DataFrame. [[graft.plans.AnnIndexRewrite]]'s adaptive
  * variants must run a bounded side-query at plan time (count the
  * filter's survivors among the index probe's candidates; collect the
  * small query-vector side of a batched kNN) against plan fragments
  * they matched inside the query being optimized — fragments only
  * exist as LogicalPlans, and `Dataset.ofRows` is the supported
  * internal constructor for exactly this (every Spark SQL entry point
  * funnels through it). Nothing else from the private surface is
  * touched.
  */
object PlanOps {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
