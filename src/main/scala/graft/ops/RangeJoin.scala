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

  /** Interval-OVERLAP join: pairs `(a, b)` whose closed intervals
    * `[a.start, a.end] ∩ [b.start, b.end] ≠ ∅` — span reconciliation
    * (sessions × incidents, ad slots × deliveries, substring-span sets)
    * that a raw `a.s <= b.e AND b.s <= a.e` predicate plans as a
    * quadratic nested loop. Bucketized: each interval replicates to
    * every `bucketWidth` bucket it covers (replication bounded by
    * `maxLen/width + 1` — pick width near the p99 interval length), the
    * join is an equi-join on the bucket with the exact overlap predicate
    * as residual, and each qualifying pair is emitted EXACTLY ONCE with
    * no distinct pass: only in the canonical bucket
    * `floor(max(a.start, b.start) / width)` — overlap guarantees both
    * sides cover it, uniqueness is arithmetic ([[graft.ops.Funnel]]-spec
    * proves the same pigeonhole style for bitstrings).
    *
    * Intervals must be well-formed (`start <= end`): an inverted row
    * would replicate to a DESCENDING bucket sequence (empty under
    * Spark's step inference rules is not guaranteed) and could miss its
    * canonical bucket — gate ingest with t19's profiler or a
    * `filter(s <= e)` when the source can't promise it.
    *
    * @return (idA, idB, overlap_s) — overlap length inclusive-seconds
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      idCols: (String, String), startCols: (String, String),
      endCols: (String, String), bucketWidthS: Long): DataFrame = {
    require(bucketWidthS > 0, s"bucket width must be positive: $bucketWidthS")
    val w = bucketWidthS
    def spread(df: DataFrame, id: String, s: String, e: String,
        p: String): DataFrame =
      df.select(col(id).as(s"${p}_id"), col(s).as(s"${p}_s"), col(e).as(s"${p}_e"))
        .withColumn("__bkt",
          explode(sequence(floor(col(s"${p}_s") / w), floor(col(s"${p}_e") / w))))
    val av = spread(a, idCols._1, startCols._1, endCols._1, "a")
    val bv = spread(b, idCols._2, startCols._2, endCols._2, "b")
    av.join(bv, Seq("__bkt"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("__bkt") === floor(greatest(col("a_s"), col("b_s")) / w))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap_s"))
  }

  /** VALIDATING form of [[intervalOverlapJoin]] — io6's corrupt-record
    * side channel applied to the well-formed-interval contract: the
    * strict operator documents that an inverted (`start > end`) or
    * NULL-bounded row can silently miss its canonical bucket and drop
    * pairs, which makes a misbehaving upstream producer an invisible
    * correctness bug. Here malformed rows are split into a QUARANTINE
    * frame `(side, id, s, e, reason)` (`reason ∈ {null_bound,
    * inverted}`) BEFORE the bucket spread, the join runs on the
    * well-formed remainder only, and the caller decides the policy —
    * alert, re-ingest, or require-empty. Two narrow filters per side,
    * no extra shuffle; the pair output is identical to the strict
    * operator on pre-cleaned input.
    *
    * @return (pairs, quarantine)
    */
  def intervalOverlapJoinValidated(a: DataFrame, b: DataFrame,
      idCols: (String, String), startCols: (String, String),
      endCols: (String, String), bucketWidthS: Long): (DataFrame, DataFrame) = {
    def valid(s: String, e: String) =
      col(s).isNotNull && col(e).isNotNull && col(s) <= col(e)
    def quarantineOf(df: DataFrame, side: String, id: String, s: String,
        e: String): DataFrame =
      df.filter(!valid(s, e))
        .select(lit(side).as("side"), col(id).cast("long").as("id"),
          col(s).cast("long").as("s"), col(e).cast("long").as("e"),
          when(col(s).isNull || col(e).isNull, "null_bound")
            .otherwise("inverted").as("reason"))
    val pairs = intervalOverlapJoin(
      a.filter(valid(startCols._1, endCols._1)),
      b.filter(valid(startCols._2, endCols._2)),
      idCols, startCols, endCols, bucketWidthS)
    val quarantine = quarantineOf(a, "a", idCols._1, startCols._1, endCols._1)
      .unionByName(quarantineOf(b, "b", idCols._2, startCols._2, endCols._2))
    (pairs, quarantine)
  }
}
