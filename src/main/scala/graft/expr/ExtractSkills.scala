package graft.expr

import graft.nlp.SkillMatcher
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * exactly like the UDF path). Evaluation is `CodegenFallback` (the trie
  * walk is JVM code either way; codegen could only inline the call).
  */
case class ExtractSkillsExpr(child: Expression, matcher: Broadcast[SkillMatcher])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_skills requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val skills = matcher.value.extract(input.asInstanceOf[UTF8String].toString)
    ArrayData.toArrayData(skills.map(UTF8String.fromString).toArray)
  }

  override def prettyName: String = "extract_skills"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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
