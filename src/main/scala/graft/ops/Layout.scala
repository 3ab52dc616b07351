package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan-time file skipping — the write-side
  * half of 100 TB performance. Parquet/Delta readers prune row groups and
  * files with column min/max stats, but stats only prune when the layout
  * gives each file a tight value range; a single-column sort gives tight
  * ranges on ONE column and random ranges on every other. Z-ordering
  * (Morton-curve interleaving) bounds the per-file range of EVERY
  * clustering dimension simultaneously, so selective predicates on any of
  * them skip most files — the same layout Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort-order rewrite produce.
  *
  * No counterpart exists in the reference (its sink partitions by
  * low-cardinality (job_type, date) — SURVEY §2 S4, the right tool for
  * categorical dims); z-order covers the high-cardinality numeric dims
  * that directory partitioning cannot.
  */
object Layout {

  /** The Morton (Z-curve) value: the low `bitsPerDim` bits of each input
    * column, bit-interleaved (dimension j contributes bit i to output bit
    * `i·d + j`). Inputs must be non-negative (callers map domains onto
    * `[0, 2^bitsPerDim)` — modulo for synthetic keys, rank or min-shift
    * for arbitrary ones); bits above `bitsPerDim` are ignored, which
    * callers must treat as a wrap, not a sort of the raw value.
    *
    * Built from `d × bitsPerDim` unrolled shift/mask/or primitives — all
    * inside whole-stage codegen, no UDF, no allocation. Capped at 62 total
    * bits so the result stays a positive LONG.
    */
  def zValue(cols: Seq[Column], bitsPerDim: Int): Column = {
    val d = cols.length
    require(d >= 2, s"z-order needs >= 2 dimensions, got $d")
    require(bitsPerDim >= 1 && d * bitsPerDim <= 62,
      s"$d dims x $bitsPerDim bits exceeds the 62-bit LONG budget")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bitsPerDim
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `numPartitions` output partitions clustered along
    * the Z-curve of `zCols`: range-partition on the z-value (so each
    * output file owns a contiguous curve segment ≈ a tight hyper-rectangle
    * in the clustered dims), then sort within partitions (so row groups
    * inside each file get tight stats too). One sampling pass + one
    * shuffle — the cost of any global re-layout; run it once per
    * ingest/compaction window, not per query.
    */
  def clusterByZ(df: DataFrame, zCols: Seq[String], bitsPerDim: Int,
      numPartitions: Int): DataFrame =
    df.withColumn("__z", zValue(zCols.map(col), bitsPerDim))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Compaction planner: assign files (or any sized units) to
    * target-sized output bins — the small-files problem's planning step
    * (a 100 TB table accretes millions of KB-scale files from streaming
    * ingest; compaction rewrites each bin as one ~`targetBytes` file).
    * Greedy in deterministic `orderCols` order via a running byte total:
    * `bin = (cumsum − size) div target`, so every bin except possibly the
    * last holds ≥ `targetBytes` once its boundary file lands, no bin
    * splits a file, and the assignment is a pure function of the listing
    * — rerunnable, engine-replayable.
    *
    * Scale note: this is a METADATA-scale op (one row per file, not per
    * record). The global ordered window is a single-reducer sort — fine
    * up to low-millions of files; partition the listing (e.g. by table
    * partition) and plan per-partition when beyond, or use
    * [[Sampling.withGlobalIndex]]'s two-pass range-sort shape.
    */
  def compactionBins(files: DataFrame, orderCols: Seq[String],
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(orderCols.nonEmpty, "need a deterministic file order")
    require(targetBytes > 0, s"bad target $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin", expr(s"(__cum - $sizeCol) div $targetBytes"))
      .drop("__cum")
  }
}
