package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-window range join: pairs `(l, r)` with `l.key = r.key` and
  * `r.ts ∈ [l.ts − before, l.ts]` — "events within the preceding N
  * minutes". Spark plans a raw range predicate as BroadcastNestedLoopJoin
  * (quadratic, broadcast of a whole side); this operator turns it into an
  * EQUI-join by time bucketing.
  */
object RangeJoin {

  /** Inner range join via time buckets of width `beforeUs` (microseconds).
    *
    * Each right row lands in exactly ONE bucket `floor(ts / before)`; each
    * left row probes its own bucket and the one below — since the bucket
    * width equals the range width, those two buckets cover
    * `[l.ts − before, l.ts]` entirely, and because a right row has a
    * unique bucket no pair can match twice (no dedup needed). The join is
    * an equi-join on (key, bucket) with the exact range check as a
    * residual filter: one shuffle each side, left replicated 2×ids-only,
    * per-bucket build sizes bounded by data density per (key, window) —
    * the shape survives 100 TB where the nested loop cannot.
    *
    * Timestamps are compared in microseconds (`unix_micros`), inclusive on
    * both ends. Output: every left column, plus each `payloadCols` right
    * column prefixed `r_`.
    */
  def boundedRangeJoin(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, beforeUs: Long,
      payloadCols: Seq[String]): DataFrame = {
    require(beforeUs > 0, s"window must be positive, got $beforeUs")
    val leftCols = left.columns.toSeq
    val lus = unix_micros(col(tsCol))
    val l = left
      .withColumn("__us", lus)
      .withColumn("__bkt", explode(array(
        floor(lus / beforeUs) - 1, floor(lus / beforeUs))))
    val rus = unix_micros(col(tsCol))
    val r = right.select(
      (col(keyCol).as("__rk") +: rus.as("__rus") +:
        payloadCols.map(c => col(c).as(s"r_$c"))): _*)
      .withColumn("__bkt", floor(col("__rus") / beforeUs))
    l.join(r,
        l(keyCol) === r("__rk") && l("__bkt") === r("__bkt") &&
        col("__rus") >= col("__us") - beforeUs && col("__rus") <= col("__us"))
      .select((leftCols.map(col) ++ payloadCols.map(c => col(s"r_$c"))): _*)
  }
}
