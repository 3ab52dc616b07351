package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def frame(rows: Seq[(Long, Long, java.sql.Timestamp, Double)],
      valCol: String): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "k", "ts", valCol)
  }

  private val left = frame(Seq(
    (1L, 10L, ts("2026-01-01 10:00:00"), 0.0),   // before any right row
    (2L, 10L, ts("2026-01-01 10:05:00"), 0.0),   // exactly at a right ts (inclusive)
    (3L, 10L, ts("2026-01-01 10:30:00"), 0.0),   // after two right rows → latest wins
    (4L, 20L, ts("2026-01-01 10:30:00"), 0.0)),  // other key: isolated
    "x")

  private val right = frame(Seq(
    (100L, 10L, ts("2026-01-01 10:05:00"), 1.5),
    (101L, 10L, ts("2026-01-01 10:20:00"), 2.5),
    (102L, 20L, ts("2026-01-01 10:10:00"), 9.5)),
    "v")

  test("asofBackward: inclusive tie, latest-wins, null when nothing precedes, key isolation") {
    val out = AsOfJoin.asofBackward(left, right, "k", "ts", Seq("id", "v"))
      .orderBy("id")
      .select(col("id"), col("asof_id"), col("asof_v"))
      .collect()
    assert(out.map(r => Option(r.get(1))).toSeq ==
      Seq(None, Some(100L), Some(101L), Some(102L)))
    assert(out(2).getDouble(2) == 2.5)
    // left columns pass through untouched
    val cols = AsOfJoin.asofBackward(left, right, "k", "ts", Seq("v")).columns.toSeq
    assert(cols == Seq("id", "k", "ts", "x", "asof_v"))
  }

  test("asofBackward plans one shuffle on the key — no nested loop, no broadcast of a side") {
    val plan = AsOfJoin.asofBackward(left, right, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
  test("asofForward: inclusive tie, earliest-following wins, null when nothing follows") {
    val out = AsOfJoin.asofForward(left, right, "k", "ts", Seq("id", "v"))
      .orderBy("id")
      .select(col("id"), col("asof_id"), col("asof_v"))
      .collect()
    // id=1 @10:00 → next right @10:05 (100); id=2 @10:05 → inclusive tie (100)
    // id=3 @10:30 → nothing follows; id=4 key 20 @10:30 → nothing follows
    assert(out.map(r => Option(r.get(1))).toSeq ==
      Seq(Some(100L), Some(100L), None, None))
  }

  test("asofBackwardNative (custom physical operator) == window formulation") {
    import spark.implicits._
    // randomized multi-partition corpus incl. keys with no right rows
    val l = (1L to 300L).map(i => (i, i % 7, ts(f"2026-01-01 ${(i % 12) + 1}%02d:${i % 60}%02d:00"), 0.0))
    val r = (1L to 80L).map(i => (1000 + i, i % 9, ts(f"2026-01-01 ${(i % 12) + 1}%02d:${(i * 7) % 60}%02d:30"), i * 1.5))
    val lf = l.toDF("id", "k", "ts", "x").repartition(5)
    val rf = r.toDF("id", "k", "ts", "v").repartition(3)
    val viaWindow = AsOfJoin.asofBackward(lf, rf, "k", "ts", Seq("id", "v"))
      .select("id", "asof_id", "asof_v")
    val viaNative = AsOfJoin.asofBackwardNative(lf, rf, "k", "ts", Seq("id", "v"))
      .select("id", "asof_id", "asof_v")
    assert(viaNative.count() == 300)
    assert(viaNative.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaNative).isEmpty)
  }

  test("asofBackwardNative plans through AsofJoinExec, golden semantics hold") {
    val df = AsOfJoin.asofBackwardNative(left, right, "k", "ts", Seq("id", "v"))
    val plan = df.queryExecution.executedPlan.toString
    // the physical node renders without its Exec suffix
    assert(plan.contains("AsofJoin "), s"custom exec not planned:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
    val out = df.orderBy("id").select(col("id"), col("asof_id"), col("asof_v")).collect()
    assert(out.map(r => Option(r.get(1))).toSeq ==
      Seq(None, Some(100L), Some(101L), Some(102L)))
    assert(out(2).getDouble(2) == 2.5)
  }

}

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("boundedRangeJoin: inclusive bounds, bucket-boundary pairs, no duplicates") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:10:00"))).toDF("id", "k", "ts")
    val mkR = (id: Long, k: Long, t: String) => (id, k, ts(t))
    val right = Seq(
      mkR(200L, 10L, "2026-01-01 10:00:00"),  // exactly lower bound (l.ts - 10 min)
      mkR(201L, 10L, "2026-01-01 10:10:00"),  // exactly l.ts (upper bound)
      mkR(202L, 10L, "2026-01-01 10:04:59"),  // inside, previous bucket
      mkR(203L, 10L, "2026-01-01 09:59:59"),  // 1 s outside
      mkR(204L, 10L, "2026-01-01 10:10:01"),  // 1 s after
      mkR(205L, 99L, "2026-01-01 10:05:00"))  // other key
      .toDF("rid", "k", "ts")
    val out = RangeJoin.boundedRangeJoin(left, right, "k", "ts",
        600L * 1000000L, Seq("rid"))
      .select(col("r_rid")).as[Long].collect().sorted.toSeq
    assert(out == Seq(200L, 201L, 202L))
  }

  test("boundedRangeJoin is an equi-join (SortMerge/ShuffledHash), not a nested loop") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2026-01-01 10:10:00"))).toDF("id", "k", "ts")
    val right = Seq((2L, 10L, ts("2026-01-01 10:05:00"))).toDF("rid", "k", "ts")
    val plan = RangeJoin.boundedRangeJoin(left, right, "k", "ts",
        600L * 1000000L, Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("intervalOverlapJoin == naive theta join, exactly-once, on random spans") {
    import spark.implicits._
    // deterministic pseudo-random intervals spanning many buckets
    def ivs(seed: Long, n: Int) = (0 until n).map { i =>
      val s = (i * 9973 + seed * 131) % 5000
      (seed * 1000 + i, s, s + 1 + (i * 37 + seed) % 900) // len 1..900
    }
    val a = ivs(1, 80).toDF("a_id", "s", "e")
    val b = ivs(2, 80).toDF("b_id", "s", "e")
    val got = RangeJoin.intervalOverlapJoin(a.repartition(3), b.repartition(5),
        ("a_id", "b_id"), ("s", "s"), ("e", "e"), 256L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly-once: no pair appears twice
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length)
    // equality with the naive quadratic reference, overlap lengths included
    val want = for {
      (ai, as_, ae) <- ivs(1, 80)
      (bi, bs, be) <- ivs(2, 80)
      if as_ <= be && bs <= ae
    } yield (ai, bi, math.min(ae, be).toLong - math.max(as_, bs).toLong)
    assert(got.sorted.toSeq == want.sorted.map(t => (t._1, t._2, t._3)))
    assert(got.nonEmpty)
  }

  test("intervalOverlapJoinValidated: malformed spans quarantined, pairs intact") {
    import spark.implicits._
    // rows 10/11 malformed (inverted, null bound) — with the STRICT
    // operator the inverted span could silently drop pairs; the
    // validator must route both to quarantine with reasons and produce
    // exactly the pairs of the pre-cleaned input
    val a = Seq((1L, Some(0L), Some(100L)), (10L, Some(90L), Some(20L)),
      (11L, None, Some(50L))).toDF("a_id", "s", "e")
    val b = Seq((2L, Some(50L), Some(150L)), (3L, Some(400L), Some(500L)))
      .toDF("b_id", "s", "e")
    val (pairs, quarantine) = RangeJoin.intervalOverlapJoinValidated(a, b,
      ("a_id", "b_id"), ("s", "s"), ("e", "e"), 64L)
    val q = quarantine.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(4))).sorted.toSeq
    assert(q == Seq(("a", 10L, "inverted"), ("a", 11L, "null_bound")), q)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 50L)), got.toString)
    // clean input: quarantine empty, pairs equal the strict operator
    val (p2, q2) = RangeJoin.intervalOverlapJoinValidated(
      a.filter(col("a_id") === 1L), b,
      ("a_id", "b_id"), ("s", "s"), ("e", "e"), 64L)
    assert(q2.isEmpty)
    assert(p2.collect().toSeq == RangeJoin.intervalOverlapJoin(
      a.filter(col("a_id") === 1L), b,
      ("a_id", "b_id"), ("s", "s"), ("e", "e"), 64L).collect().toSeq)
  }

  test("intervalOverlapJoin plans as an equi-join on the bucket — no nested loop") {
    import spark.implicits._
    val a = Seq((1L, 0L, 100L)).toDF("a_id", "s", "e")
    val b = Seq((2L, 50L, 150L)).toDF("b_id", "s", "e")
    val plan = RangeJoin.intervalOverlapJoin(a, b,
        ("a_id", "b_id"), ("s", "s"), ("e", "e"), 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
