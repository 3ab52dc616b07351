package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built on the
  * higher-order built-ins (`zip_with` / `aggregate`) so the arithmetic is
  * codegen'd and runs as a narrow map — no UDF, no serialization hop.
  *
  * All accumulation is in double (each float is cast before multiply) with
  * a deterministic left-to-right fold, so results are reproducible and
  * engine-comparable.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null/zero-norm inputs yield null. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(null).cast("double")).otherwise(d / nn)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double")
      diff * diff
    }), lit(0.0), (acc, v) => acc + v))

  // ---- native fast paths (graft.expr.VecExpressions, codegen'd loops) ----
  // Same values bit-for-bit as the HOF forms (double, left-to-right fold),
  // ~250× less per-pair overhead inside similarity joins. Requires
  // `VecExpressions.register(spark)` (idempotent) on the session.

  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def l2NativeSq(a: Column, b: Column): Column = call_function("vec_l2sq", a, b)

  def normNative(a: Column): Column = sqrt(dotNative(a, a))

  /** Cosine from a precomputed-norm layout: norms are materialized once per
    * row (not re-folded per pair — the all-pairs join cost that matters).
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    when(normA * normB === 0.0, lit(null).cast("double"))
      .otherwise(dotNative(a, b) / (normA * normB))
}
