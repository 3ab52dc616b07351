package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expr.{CountInSet, RollingTokenHash, VecDot, VecL2Sq}

/** SparkSessionExtensions installer — the deployment-config path for the
  * engine's session-independent custom expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * (`ExtractSkillsExpr` binds a broadcast gazetteer, so it registers at
  * runtime via `ExtractSkillsExpr.register(spark, matcher)` instead.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_l2sq"),
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecL2Sq(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("count_in_set"),
      new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CountInSet(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("rolling_token_hash"),
      new ExpressionInfo(classOf[RollingTokenHash].getName, "rolling_token_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingTokenHash(exprs(0))))
  }
}
