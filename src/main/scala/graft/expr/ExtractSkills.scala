package graft.expr

import graft.nlp.SkillMatcher
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** E2 as a native Catalyst expression (SURVEY.md §7.6): gazetteer skill
  * extraction over a broadcast token-trie.
  *
  * Versus the v0 Scala UDF ([[graft.functions.SkillFunctions]]): no
  * ScalaUDF null-wrapping/encoder layer, a readable `extract_skills(...)`
  * node in plans, and SQL availability via the function registry. The
  * matcher travels as a `Broadcast` handle inside the expression — tasks
  * deserialize a reference, not the trie (one torrent broadcast per job,
  * exactly like the UDF path).
  *
  * Codegen emits one static-helper call over the broadcast handle (the
  * [[graft.expr.TextExprHelpers]] pattern), so the surrounding projection
  * stays inside whole-stage codegen — the former `CodegenFallback` forced
  * the WHOLE stage into per-row interpreted eval, the 33×-measured
  * penalty `TextExpressions.scala` documents. Measured on p6 (full
  * 2,412-pattern gazetteer + salted descriptions, sf0.1, warm session):
  * 2.2 s → 2.2 s — flat, because p6's stage is the trie walk plus a
  * parquet write and the trie cost is identical either way. The win is
  * structural, not local: any FUTURE pipeline putting extract_skills
  * beside the hot tokenize/shingle kernels no longer drags those into
  * the interpreted path.
  */
case class ExtractSkillsExpr(child: Expression, matcher: Broadcast[SkillMatcher])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_skills requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    SkillExprHelpers.extract(matcher.value, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("skillMatcherBc", matcher,
      classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SkillExprHelpers.extract($bcRef.value(), $c);")
  }

  override def prettyName: String = "extract_skills"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static home for the per-row kernel (a standalone object, so Scala
  * emits a Janino-callable static forwarder — the generated code calls
  * `graft.expr.SkillExprHelpers.extract(bc.value(), utf8)` directly).
  */
object SkillExprHelpers {
  def extract(matcher: Object, s: UTF8String): ArrayData = {
    val skills = matcher.asInstanceOf[SkillMatcher].extract(s.toString)
    ArrayData.toArrayData(skills.map(UTF8String.fromString).toArray)
  }
}

object ExtractSkillsExpr {
  /** Broadcast the matcher and register `extract_skills(text)` on the
    * session (Column DSL via `call_function` + plain SQL). Re-registering
    * with a different matcher replaces the binding.
    */
  def register(spark: SparkSession, matcher: SkillMatcher,
      name: String = "extract_skills"): Unit = {
    val bc = spark.sparkContext.broadcast(matcher)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => ExtractSkillsExpr(exprs.head, bc), "built-in")
  }
}
