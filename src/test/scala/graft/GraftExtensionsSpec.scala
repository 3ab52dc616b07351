package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.graft.ExtensionsProbe

/** The `spark.sql.extensions=graft.GraftExtensions` deployment path: a
  * session configured ONLY via extensions (spark-submit --conf, no code)
  * must resolve every engine function AND plan the custom operator tier.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions inject every engine function and the planner strategy") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // planner strategy: the whole-operator tier is wired
    val strategies = ExtensionsProbe.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsofJoinStrategy),
      s"AsofJoinStrategy not injected: $strategies")
    // functions: every name from the single-source-of-truth list lands
    // in a fresh registry
    val reg = ExtensionsProbe.registerInto(ext, FunctionRegistry.builtin.clone())
    graft.expr.VecExpressions.functions.foreach { f =>
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(f.name)),
        s"function ${f.name} not injected")
    }
  }
}
