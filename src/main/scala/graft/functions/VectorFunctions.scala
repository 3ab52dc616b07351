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
}
