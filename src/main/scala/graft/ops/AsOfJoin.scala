package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series "most recent right row at or
  * before each left row's timestamp, per key" join (trade↔quote,
  * event↔latest-state). The reference has no such operator; this is part
  * of the extended training-data-pipeline tier (feature backfill: attach
  * the latest label/metric snapshot to every example).
  */
object AsOfJoin {

  /** For every left row, attach the payload of the right row with the
    * greatest `tsCol` ≤ the left row's `tsCol` within the same `keyCol`
    * (null payload when no right row precedes).
    *
    * Spark-first shape: tag both sides, UNION them, and carry the latest
    * right payload forward with one `last(_, ignoreNulls)` running window
    * over the key ordered by (ts, tag) — ONE shuffle on the key plus a
    * per-key sort, the same wide-edge cost as a plain equi-join. The naive
    * formulations Spark would otherwise plan — a θ-join on `r.ts <= l.ts`
    * (BroadcastNestedLoop) or a per-left-row correlated max (a join back
    * onto an aggregate) — are quadratic or double-shuffle; this is
    * neither, and it scales with the union's row count.
    *
    * Right rows sort BEFORE left rows at equal ts (tag 0 < 1), so a right
    * row at exactly the left timestamp matches (inclusive as-of, the
    * DuckDB/pandas `merge_asof` convention). If several right rows share
    * (key, ts), the GREATEST payload struct among them is carried (the
    * payload is the final window sort key, so the pick is deterministic
    * across runs and partitionings — without it, `last(_, ignoreNulls)`
    * would depend on shuffle arrival order). DuckDB's native ASOF leaves
    * the same tie unspecified; pre-aggregate the right side to one row per
    * (key, ts) when a different tie rule is needed.
    *
    * The whole-struct tiebreak requires every payload column to be
    * ORDERABLE (no map types — validated up front with a clear error),
    * and it puts the full payload width into the sort key of every row.
    * For wide payloads, or payloads containing maps, pass `tiebreakCol`
    * — a single payload column used as the tie sort key instead; right
    * rows that also tie on it fall back to shuffle-order ambiguity, so
    * pick a column unique per (key, ts).
    *
    * Output: every left column, plus each `payloadCols` right column
    * prefixed `asof_`.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payloadCols: Seq[String],
      tiebreakCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tie = tieKey(right, payloadCols, tiebreakCol)
    val payloadType = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__tag"),
      struct(leftCols.map(col): _*).as("__lp"),
      lit(null).cast(payloadType).as("__rp"))
    val leftPayloadType = l.schema("__lp").dataType
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__tag"),
      lit(null).cast(leftPayloadType).as("__lp"),
      struct(payloadCols.map(col): _*).as("__rp"))
    // the tie key (whole payload struct, or the caller's tiebreakCol) as
    // the final sort key = deterministic tiebreak among right rows
    // sharing (key, ts): `last` then always picks the greatest one.
    // Left rows (all-null __rp) tie with each other, which is harmless —
    // their frames see the same preceding right rows either way.
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tag"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val outCols = leftCols.map(c => col(s"__lp.$c").as(c)) ++
      payloadCols.map(c => col(s"__m.$c").as(s"asof_$c"))
    matched.select(outCols: _*)
  }

  /** Backward as-of through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsofJoinExec]] — logical node + planner strategy +
    * sort-merge exec, the whole-operator Catalyst tier): semantics
    * identical to [[asofBackward]], but each side is sorted
    * independently and merged with a streaming backward pointer instead
    * of packing the left relation into structs through one combined
    * union+window sort. Output columns: every left column, then each
    * payload column as `asof_<name>` — the same shape as
    * [[asofBackward]].
    */
  def asofBackwardNative(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    graft.plans.AsofJoinStrategy.install(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so exprIds stay disjoint even when both
    // sides derive from the same base relation (self-join shape) — the
    // analyzer's relation dedup does not know our custom node
    val rBase = right.queryExecution.analyzed
    val rPlan = Project(rBase.output.map(a => Alias(a, a.name)()), rBase)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(sys.error(s"asof: no column '$n'"))
    val node = graft.plans.AsofJoin(lPlan, rPlan,
      attr(lPlan.output, keyCol), attr(lPlan.output, tsCol),
      attr(rPlan.output, keyCol), attr(rPlan.output, tsCol),
      payloadCols.map(attr(rPlan.output, _)))
    org.apache.spark.sql.graft.DatasetShim.ofRows(spark, node)
  }

  /** Forward as-of: the right row with the SMALLEST `tsCol` ≥ the left
    * row's timestamp per key (next-event attribution: "first purchase at
    * or after this impression"). Same union + single-window shape as
    * [[asofBackward]], mirrored: `first(_, ignoreNulls)` over the
    * UNBOUNDED FOLLOWING frame, right rows sorting AFTER left rows at
    * equal ts so an exactly-simultaneous right row matches (inclusive).
    * Right rows tied on (key, ts) resolve to the GREATEST payload struct,
    * matching [[asofBackward]]'s tie rule (descending payload sort, so
    * `first` meets the greatest one); `tiebreakCol` narrows the tie sort
    * key exactly as documented there.
    */
  def asofForward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payloadCols: Seq[String],
      tiebreakCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tie = tieKey(right, payloadCols, tiebreakCol)
    val payloadType = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__tag"),
      struct(leftCols.map(col): _*).as("__lp"),
      lit(null).cast(payloadType).as("__rp"))
    val leftPayloadType = l.schema("__lp").dataType
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__tag"),
      lit(null).cast(leftPayloadType).as("__lp"),
      struct(payloadCols.map(col): _*).as("__rp"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__tag"), tie.desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = l.unionByName(r)
      .withColumn("__m", first(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
    val outCols = leftCols.map(c => col(s"__lp.$c").as(c)) ++
      payloadCols.map(c => col(s"__m.$c").as(s"asof_$c"))
    matched.select(outCols: _*)
  }

  /** Tie sort key among right rows sharing (key, ts): the whole payload
    * struct by default — validated ORDERABLE up front, because a
    * map-typed payload column would otherwise fail window analysis with
    * an opaque engine error — or the caller's single `tiebreakCol`
    * (extracted from the payload struct; null on left rows, which only
    * tie with each other).
    */
  private def tieKey(right: DataFrame, payloadCols: Seq[String],
      tiebreakCol: Option[String]): org.apache.spark.sql.Column =
    tiebreakCol match {
      case Some(c) =>
        require(payloadCols.contains(c),
          s"tiebreakCol '$c' must be one of payloadCols $payloadCols")
        col(s"__rp.$c")
      case None =>
        val st = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType
        require(
          org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(st),
          s"as-of payload is not orderable as a tie key (map-typed column?): " +
            s"$st — pass tiebreakCol to use one orderable payload column instead")
        col("__rp")
    }
}
