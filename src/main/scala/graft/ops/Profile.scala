package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the ingest-time health check a 100 TB
  * lakehouse runs before anything else touches a new drop: per-column row
  * counts, null counts, and EXACT distinct cardinalities, in ONE pass
  * over the data.
  *
  * Scale shape: all columns' aggregates ride a single scan. Multiple
  * `count(DISTINCT col)` in one aggregate plan through Spark's Expand
  * operator — the input is replicated once per distinct-column with a
  * gid, partially de-duplicated map-side, and the final aggregate sees
  * one stream — so k profiled columns cost one scan + one shuffle of the
  * expanded-but-combined rows, not k jobs (the naive per-column loop is
  * k full scans). For web-scale cardinalities where exact distinct is
  * not worth its shuffle, swap `countDistinct` for
  * `approx_count_distinct` (HLL++, fixed-size sketch, no expand) — same
  * output schema, sketch-accuracy contract; the exact form is the gated
  * one because HLL estimates are not engine-portable.
  */
object Profile {

  /** One row per profiled column: `(column, n_rows, n_null, n_distinct)`
    * — `n_distinct` counts distinct non-null values (SQL `count(DISTINCT
    * col)` semantics on both engines).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), countDistinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row into the per-column layout: a
    // driver-free stack over the 1-row frame (the heavy work is done)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column").as("column"), col("p.n_rows").as("n_rows"),
        col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"))
  }
}
