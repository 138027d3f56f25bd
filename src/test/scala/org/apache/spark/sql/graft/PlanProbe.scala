package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Test-only bridge to the `private[sql]` `Dataset.ofRows`, so
  * PlanLintSpec can materialize a Window node's CHILD subplan and
  * measure the real cardinality of its partition keys at fixture scale
  * (a static name-based lint can't see through aliases/derived keys).
  */
object PlanProbe {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
