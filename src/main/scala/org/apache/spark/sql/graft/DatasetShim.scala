package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge: building a DataFrame from a CUSTOM
  * logical plan node (graft's as-of join, `graft.plans.AsofJoin`) needs
  * `Dataset.ofRows`, which Spark scopes to its own package — the
  * standard technique for extension libraries that add whole-operator
  * plan nodes (cf. the public Pathling/Sedona/Delta codebases). This is
  * the ONLY file outside the `graft` namespace; nothing else internal
  * is touched.
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
