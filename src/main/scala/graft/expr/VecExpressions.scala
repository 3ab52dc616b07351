package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for dense `array<float>` math.
  *
  * The `zip_with`/`aggregate` higher-order-function forms in
  * [[graft.functions.VectorFunctions]] are correct but evaluate a lambda
  * per element (measured ~25 µs per 64-dim pair): inside an all-pairs
  * similarity join that's the entire runtime. These expressions generate a
  * tight scalar loop (`doGenCode`) over the underlying ArrayData —
  * ~100 ns per pair, and they stay inside whole-stage codegen.
  *
  * Accumulation is double, left-to-right, identical to both the HOF form
  * and the DuckDB oracle's `list_sum(list_transform(...))`.
  */
abstract class VecFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** scalar combine in generated code: given float a_i, b_i produce the
    * value added to the accumulator
    */
  protected def combineJava(x: String, y: String): String
  protected def combine(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += combine(x.getFloat(i).toDouble, y.getFloat(i).toDouble); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $s += ${combineJava(x, y)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** dot(a, b) = Σ aᵢ·bᵢ (double). */
case class VecDot(left: Expression, right: Expression) extends VecFoldExpression {
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def combine(x: Double, y: Double): Double = x * y
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2sq(a, b) = Σ (aᵢ−bᵢ)² (double; sqrt applied by the caller so the
  * expression stays a pure fold).
  */
case class VecL2Sq(left: Expression, right: Expression) extends VecFoldExpression {
  override protected def combineJava(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override def prettyName: String = "vec_l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object VecExpressions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  /** The engine's full registry of session-independent custom expressions.
    * SINGLE SOURCE OF TRUTH: both [[register]] (programmatic path) and
    * [[graft.GraftExtensions]] (spark.sql.extensions deployment path)
    * iterate this list, so the two registration paths cannot drift — a
    * session built through either path resolves the same function set.
    */
  final case class GraftFunction(
      name: String,
      exprClass: Class[_],
      builder: Seq[Expression] => Expression)

  val functions: Seq[GraftFunction] = Seq(
    GraftFunction("vec_dot", classOf[VecDot], exprs => VecDot(exprs(0), exprs(1))),
    GraftFunction("vec_l2sq", classOf[VecL2Sq], exprs => VecL2Sq(exprs(0), exprs(1))),
    GraftFunction("count_in_set", classOf[CountInSet], exprs => CountInSet(exprs(0), exprs(1))),
    GraftFunction("rolling_token_hash", classOf[RollingTokenHash], exprs => RollingTokenHash(exprs(0))),
    GraftFunction("word_shingles", classOf[WordShingles], exprs => WordShingles(exprs(0), exprs(1))),
    GraftFunction("simhash16", classOf[Simhash16], exprs => Simhash16(exprs(0))),
    GraftFunction("hashed_embed", classOf[HashedEmbed],
      exprs => HashedEmbed(exprs(0), exprs(1))),
    GraftFunction("winnow_fps", classOf[WinnowFps],
      exprs => WinnowFps(exprs(0), exprs(1), exprs(2))),
    GraftFunction("nfc_normalize", classOf[NfcNormalize], exprs => NfcNormalize(exprs(0))))

  /** Register every engine function in the session's registry — usable from
    * both the Column DSL (`call_function`) and plain SQL. Idempotent PER
    * FUNCTION: each name is guarded on its own existence, so a session that
    * already has a subset (e.g. built via the extensions path before
    * word_shingles/simhash16 were added there) still gets the missing ones,
    * and already-present names aren't re-registered (the replace-every-call
    * form logged a `SimpleFunctionRegistry` WARN per query, dozens per
    * bench run, which buried the bench's JSON output line).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { f =>
      if (!reg.functionExists(FunctionIdentifier(f.name)))
        reg.createOrReplaceTempFunction(f.name, f.builder, "built-in")
    }
  }
}
