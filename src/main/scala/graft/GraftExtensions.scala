package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expr.VecExpressions

/** SparkSessionExtensions installer — the deployment-config path for the
  * engine's session-independent custom expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * Injects the SAME function list as [[graft.expr.VecExpressions.register]]
  * (`VecExpressions.functions` is the single source of truth), so a session
  * configured only via extensions resolves everything Dedup/Similarity/
  * TextFunctions call — including word_shingles/simhash16.
  *
  * (`ExtractSkillsExpr` binds a broadcast gazetteer, so it registers at
  * runtime via `ExtractSkillsExpr.register(spark, matcher)` instead.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    VecExpressions.functions.foreach { f =>
      e.injectFunction((
        FunctionIdentifier(f.name),
        new ExpressionInfo(f.exprClass.getName, f.name),
        f.builder))
    }
    // the whole-operator tier: plans graft's custom logical nodes
    // (AsofJoin) — sessions built via extensions get it without the
    // programmatic AsofJoinStrategy.install call
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
