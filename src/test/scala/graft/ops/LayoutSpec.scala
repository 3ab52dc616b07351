package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue: known interleaves, 2 and 3 dims") {
    import spark.implicits._
    val df = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (511L, 66L, 0L), (3L, 3L, 3L)).toDF("x", "y", "w")
    val r = df.select(
      Layout.zValue(Seq(col("x"), col("y")), 16).as("z2"),
      Layout.zValue(Seq(col("x"), col("y"), col("w")), 8).as("z3"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // dim j contributes bit i to output bit i*d + j
    assert(r(0) == (0L, 0L))
    assert(r(1) == (1L, 1L))   // x bit0 -> out bit0 in both layouts
    assert(r(2) == (2L, 2L))   // y bit0 -> out bit1
    assert(r(3)._2 == 4L)      // w bit0 -> out bit2 (3 dims)
    assert(r(4)._1 == 95581L)  // independently hand-computed interleave
    assert(r(5) == (15L, 63L)) // low 2 bits set in every dim
  }

  test("zValue rejects over-budget and degenerate shapes") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("x"), col("y")), 32) // 64 > 62 bits
    }
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("x")), 8) // 1 dim is just a sort
    }
  }

  test("clusterByZ prunes on BOTH dims (vs single-column sort)") {
    // The pruning model: a point predicate on dim D scans every file whose
    // [min,max] on D covers the point — expected scan fraction = mean
    // per-file range / domain. A single-column sort is perfect on its own
    // dim and useless (range ≈ full domain) on the other; the z-layout
    // bounds both. (Bounding-box AREA is the wrong metric — it is layout-
    // invariant for uniform data; the win is balanced per-dim ranges.)
    val dom = 4096d
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(4096)).as("x"),
        pmod(xxhash64(col("l_partkey"), col("l_suppkey")), lit(4096)).as("y"))
    def scanFraction(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .agg(avg("xr").as("xr"), avg("yr").as("yr")).head
      (r.getDouble(0) / dom, r.getDouble(1) / dom)
    }
    val (zx, zy) = scanFraction(Layout.clusterByZ(li, Seq("x", "y"), 12, 64))
    val (sx, sy) = scanFraction(li.repartitionByRange(64, col("x")).sortWithinPartitions("x"))
    info(f"expected scan fraction (x, y): z-order ($zx%.3f, $zy%.3f) vs x-sort ($sx%.3f, $sy%.3f)")
    assert((zx + zy) / 2 < 0.5 * (sx + sy) / 2,
      f"z-order not better on average: z=($zx%.3f,$zy%.3f) x-sort=($sx%.3f,$sy%.3f)")
    assert(zy < 0.5 * sy, f"z-order did not bound the second dim: $zy%.3f vs $sy%.3f")
  }

  test("hilbert index: exhaustive bijection + step-adjacency law on the 8x8 grid") {
    import spark.implicits._
    val grid = (0L until 64L).map(i => (i % 8, i / 8)).toDF("x", "y")
    val idx = Layout.withHilbertIndex(grid, "x", "y", 3, "h")
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1)))).sortBy(_._1)
    // bijection: indexes are exactly 0..63
    assert(idx.map(_._1).toSeq == (0L until 64L))
    // the defining Hilbert property: EVERY consecutive curve step moves
    // to a grid neighbor (Manhattan distance exactly 1) — Morton fails
    // this at every power-of-two boundary
    for (Seq((_, (x1, y1)), (_, (x2, y2))) <- idx.toSeq.sliding(2))
      assert((x1 - x2).abs + (y1 - y2).abs == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    // curve starts at the origin
    assert(idx.head._2 == ((0L, 0L)))
  }

  test("hilbert segments beat morton segments on per-file bounding boxes") {
    import spark.implicits._
    // full 64x64 grid cut into 10 files: 409.6 points per file does NOT
    // align with any dyadic block, so Morton's long jumps widen its
    // boxes while Hilbert's adjacency keeps segments compact
    val pts = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"))
    def bboxCost(df: org.apache.spark.sql.DataFrame): Double = {
      val withPid = df.withColumn("p", spark_partition_id())
      withPid.groupBy("p")
        .agg(((max("x") - min("x")) + (max("y") - min("y"))).as("c"))
        .agg(avg("c")).head.getDouble(0)
    }
    val h = bboxCost(Layout.clusterByHilbert(pts, "x", "y", 6, 10))
    val z = bboxCost(Layout.clusterByZ(pts, Seq("x", "y"), 6, 10))
    info(f"avg per-file bbox semiperimeter: hilbert $h%.1f vs morton $z%.1f")
    assert(h < z, f"hilbert ($h%.1f) not tighter than morton ($z%.1f)")
  }
}
