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

  /** Hilbert-curve index of a 2-D point — [[zValue]]'s
    * locality-superior sibling. Both curves bound every clustered
    * dimension's per-file range, but the Hilbert curve makes NO long
    * jumps: every step along the curve moves to a grid NEIGHBOR
    * (Manhattan distance exactly 1 — LayoutSpec proves both bijectivity
    * and this adjacency law exhaustively on the 8×8 grid), so a
    * contiguous curve segment is a tighter rectangle than the
    * corresponding Morton segment and min/max file skipping prunes more
    * files at equal file counts. The price is the classic
    * rotate-and-flip state machine: `bits` rounds of integer
    * when/shift/mask primitives instead of one interleave. Each round is
    * materialized as its OWN projection (not one nested Column) — the
    * rotation reads both coordinates of the previous round twice, so a
    * single expression tree would grow ~3^bits nodes, while the
    * per-round projection chain stays linear and fully codegen'd.
    * 2-D only: the rotation table is the 2-D recursion; for d > 2
    * dimensions use [[zValue]] (Morton generalizes for free).
    *
    * Inputs must be non-negative and below `2^bits` (same caller
    * contract as [[zValue]] — map or wrap the domain first).
    */
  def withHilbertIndex(df: DataFrame, xCol: String, yCol: String,
      bits: Int, out: String): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62, s"bad bits=$bits")
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx",
          when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("__ry",
          when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
      cur = cur
        .withColumn("__hd", col("__hd")
          + lit(s) * lit(s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotate/flip: ry=0 ∧ rx=1 → (x,y) = (s−1−y, s−1−x); ry=0 ∧ rx=0
        // → swap; ry=1 → unchanged
        .withColumn("__nx", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__ny", when(col("__ry") === 0,
          when(col("__rx") === 1, lit(s - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__rx", "__ry", "__nx", "__ny")
    }
    cur.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** [[clusterByZ]] along the Hilbert curve — identical re-layout shape
    * (range-partition on the index, sort within partitions), tighter
    * per-file rectangles (see [[withHilbertIndex]]).
    */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
      bits: Int, numPartitions: Int): DataFrame =
    withHilbertIndex(df, xCol, yCol, bits, "__h")
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")

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
