package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.execution.SparkStrategy

/** Test-scope `private[sql]` probe: SparkSessionExtensions only exposes
  * its accumulated injections to Spark's own session builder, so the
  * spec asserting the `spark.sql.extensions=graft.GraftExtensions`
  * deployment path actually wires everything needs this bridge.
  */
object ExtensionsProbe {
  def plannerStrategies(e: SparkSessionExtensions, s: SparkSession): Seq[SparkStrategy] =
    e.buildPlannerStrategies(s)

  def registerInto(e: SparkSessionExtensions, registry: FunctionRegistry): FunctionRegistry =
    e.registerFunctions(registry)
}
