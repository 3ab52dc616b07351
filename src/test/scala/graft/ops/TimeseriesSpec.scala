package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeseriesSpec extends SparkSpec {

  private def evdf(rows: Seq[(Long, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "sec", "event_id", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"),
        col("event_id"), col("value"))
  }

  test("gapFillHourly: dense grid, last-per-hour survivor, forward fill") {
    val df = evdf(Seq(
      (1L, 36000L, 1L, 1.00),        // hour 10
      (1L, 36100L, 2L, 3.00),        // hour 10, later -> survivor
      (1L, 48600L, 3L, 2.50),        // hour 13
      (2L, 36000L, 4L, 7.00)))       // single-hour user
    val out = Timeseries.gapFillHourly(df, "user_id", "ts", "value", "event_id")
      .orderBy("key", "hour").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 10L, 3.00, 1L), (1L, 11L, 3.00, 0L),
      (1L, 12L, 3.00, 0L), (1L, 13L, 2.50, 1L),
      (2L, 10L, 7.00, 1L)))
  }

  test("gapFillHourly: same-second events break ties on id") {
    val df = evdf(Seq((1L, 36000L, 1L, 1.00), (1L, 36000L, 2L, 9.00)))
    val out = Timeseries.gapFillHourly(df, "user_id", "ts", "value", "event_id")
      .collect()
    assert(out.length == 1 && out(0).getDouble(2) == 9.00)
  }

  test("gapFillHourly: pre-epoch timestamps bucket by FLOOR, grid spans the sign") {
    // -7200 s = hour -2 exactly; -1 s sits in hour -1 (truncating `div`
    // would call it hour 0 and shift the whole pre-epoch grid one high)
    val df = evdf(Seq((1L, -7200L, 1L, 1.00), (1L, -1L, 2L, 2.00)))
    val out = Timeseries.gapFillHourly(df, "user_id", "ts", "value", "event_id")
      .orderBy("hour").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((-2L, 1.00, 1L), (-1L, 2.00, 1L)), out.mkString(","))
  }

  test("rollingZScore: nulls under 2 priors / zero variance; exact score") {
    val df = evdf(Seq(
      (1L, 100L, 1L, 1.00), (1L, 200L, 2L, 3.00),
      (1L, 300L, 3L, 1.00), (1L, 400L, 4L, 5.00)))
    val out = Timeseries.rollingZScore(df, "user_id", "ts", "value", "event_id", 5)
      .orderBy("id").collect()
    assert(out(0).isNullAt(3) && out(1).isNullAt(3)) // 0 and 1 priors
    // id 3: priors {100, 300} cents -> mean 200, std 100, x=100 -> -1.0
    assert(out(2).getDouble(3) == -1.0)
    // id 4: priors {100, 300, 100} -> z = (500-500/3)/sqrt(80000/9)/100-free
    assert(math.abs(out(3).getDouble(3) - 3.535534) < 1e-6)
  }

  test("rollingZScore: constant history emits null, not a division error") {
    val df = evdf(Seq(
      (1L, 100L, 1L, 2.00), (1L, 200L, 2L, 2.00), (1L, 300L, 3L, 2.00)))
    val out = Timeseries.rollingZScore(df, "user_id", "ts", "value", "event_id", 5)
      .orderBy("id").collect()
    assert(out.forall(_.isNullAt(3)))
  }

  test("ewmaSmooth: hand-computed integer recurrence; keys independent; order by (ts, id)") {
    // α = 0.5 in micros; x in cents: 100, 200, 100 (events arrive out of
    // ts order — the sorted-group order must fix it)
    val df = evdf(Seq(
      (1L, 300L, 3L, 1.00), (1L, 100L, 1L, 1.00), (1L, 200L, 2L, 2.00),
      (2L, 100L, 4L, 4.00)))
    val out = Timeseries.ewmaSmooth(df, "user_id", "ts", "value", "event_id", 500000L)
      .orderBy("id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // S1 = 100e6; S2 = (0.5·200e6 + 0.5·100e6) = 150e6;
    // S3 = (0.5·100e6 + 0.5·150e6) = 125e6; key 2 starts fresh at 400e6
    assert(out == Seq(
      (1L, 100L, 100000000L), (2L, 200L, 150000000L),
      (3L, 100L, 125000000L), (4L, 400L, 400000000L)), out.toString)
    // per-step round-half-up: α=0.3, x = 100 then 101 cents:
    // S2 = floor((0.3·101e6 + 0.7·100e6 + 0.5)/1) -> (30.3e6+70e6) = 100.3e6
    val odd = evdf(Seq((1L, 100L, 1L, 1.00), (1L, 200L, 2L, 1.01)))
    val s2 = Timeseries.ewmaSmooth(odd, "user_id", "ts", "value", "event_id", 300000L)
      .orderBy("id").collect().last.getLong(4)
    assert(s2 == 100300000L, s2.toString)
  }

  test("holtSmooth: hand-computed level+trend; forecast = l + b") {
    // α = β = 0.5; x in cents: 100, 200, 300 (a clean rising trend)
    val df = evdf(Seq(
      (1L, 100L, 1L, 1.00), (1L, 200L, 2L, 2.00), (1L, 300L, 3L, 3.00)))
    val out = Timeseries.holtSmooth(df, "user_id", "ts", "value", "event_id",
        500000L, 500000L)
      .orderBy("id").collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // x1: l=100e6 b=0; x2: l=(.5·200e6+.5·100e6)=150e6,
    //   b=.5·(150e6−100e6)=25e6; x3: l=(.5·300e6+.5·175e6)=237.5e6,
    //   b=(.5·87.5e6+.5·25e6)=56.25e6
    assert(out == Seq(
      (100000000L, 0L, 100000000L),
      (150000000L, 25000000L, 175000000L),
      (237500000L, 56250000L, 293750000L)), out.toString)
  }

  test("holtSmooth: negative trend uses FLOOR division, not truncation") {
    // x: 300 then 100 cents — the trend numerator goes negative:
    // b₂ = ⌊(.5·(200e6−300e6) + 0 + ½)/1⌋ = ⌊−49,999,999.5⌋ = −50e6
    // (truncation toward zero would give −49,999,999 — the one-micro
    // cross-engine divergence this test pins)
    val df = evdf(Seq((1L, 100L, 1L, 3.00), (1L, 200L, 2L, 1.00)))
    val last = Timeseries.holtSmooth(df, "user_id", "ts", "value", "event_id",
        500000L, 500000L)
      .orderBy("id").collect().last
    assert(last.getLong(4) == 200000000L, s"level ${last.getLong(4)}")
    assert(last.getLong(5) == -50000000L, s"trend ${last.getLong(5)}")
    assert(last.getLong(6) == 150000000L, s"forecast ${last.getLong(6)}")
  }

  test("holtWinters: constant series fixes level=x, trend=0, season=0") {
    // With zero seasonal init and a constant x: x−s[p]=x so the level
    // update is Holt's on a flat series (level pinned at x), the trend
    // numerator is 0, and the seasonal numerator γ(x−l)=0 — all three
    // states are exact fixed points, any α/β/γ/period.
    val df = evdf((1L to 10L).map(i => (1L, i * 100L, i, 2.50)))
    val out = Timeseries.holtWinters(df, "user_id", "ts", "value", "event_id",
        400000L, 300000L, 500000L, 4)
      .orderBy("id").collect()
    out.foreach { r =>
      assert(r.getLong(4) == 250000000L, s"level ${r.getLong(4)}")
      assert(r.getLong(5) == 0L && r.getLong(6) == 0L)
      assert(r.getLong(7) == 250000000L, s"forecast ${r.getLong(7)}")
    }
  }

  test("holtWinters: exact recurrence with seasonal rotation (hand-computed)") {
    // α=β=γ=0.5, m=2; x cents: 100, 300, 100, 300 (pure period-2 signal)
    // i=1: l=100e6 b=0 s=[0,0]            forecast=l+b+s[1]=100e6
    // i=2 (p=1): l=⌊.5·300e6+.5·100e6⌋=200e6, b=.5·100e6=50e6,
    //            s[1]=.5·(300e6−200e6)=50e6   forecast=l+b+s[0]=250e6
    // i=3 (p=0): l=.5·100e6+.5·250e6=175e6, b=.5·(−25e6)+.5·50e6=12.5e6,
    //            s[0]=.5·(100e6−175e6)=−37.5e6 forecast=l+b+s[1]=237.5e6
    // i=4 (p=1): l=.5·(300e6−50e6)+.5·187.5e6=218.75e6,
    //            b=.5·43.75e6+.5·12.5e6=28.125e6,
    //            s[1]=.5·(300e6−218.75e6)+.5·50e6=65.625e6
    //            forecast=l+b+s[0]=209.375e6
    val df = evdf(Seq((1L, 100L, 1L, 1.00), (1L, 200L, 2L, 3.00),
      (1L, 300L, 3L, 1.00), (1L, 400L, 4L, 3.00)))
    val out = Timeseries.holtWinters(df, "user_id", "ts", "value", "event_id",
        500000L, 500000L, 500000L, 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(out == Seq(
      (100000000L, 0L, 0L, 100000000L),
      (200000000L, 50000000L, 50000000L, 250000000L),
      (175000000L, 12500000L, -37500000L, 237500000L),
      (218750000L, 28125000L, 65625000L, 209375000L)), out.toString)
  }

  test("holtWinters: periodic series forecast beats Holt's on the same data") {
    // A strict period-4 signal: Holt smears the oscillation into trend;
    // the seasonal term should absorb it. Compare mean |forecast − next x|
    // over the last 8 points of a 24-point series.
    val xs = (0 until 24).map(i => Seq(1.00, 5.00, 9.00, 5.00)(i % 4))
    val df = evdf(xs.zipWithIndex.map { case (v, i) =>
      (1L, (i + 1) * 100L, (i + 1).toLong, v) })
    def err(rows: Array[(Long, Long)]): Double = {
      // rows: (id, forecast_micro); forecast at id i predicts x_{i+1}
      val fc = rows.toMap
      (16 to 23).map { i =>
        math.abs(fc(i.toLong) / 1e8 - xs(i)) // forecast from row i predicts xs(i) (0-based i = id i)
      }.sum / 8.0
    }
    val hw = Timeseries.holtWinters(df, "user_id", "ts", "value", "event_id",
        400000L, 300000L, 500000L, 4)
      .orderBy("id").collect().map(r => (r.getLong(2), r.getLong(7)))
    val holt = Timeseries.holtSmooth(df, "user_id", "ts", "value", "event_id",
        400000L, 300000L)
      .orderBy("id").collect().map(r => (r.getLong(2), r.getLong(6)))
    assert(err(hw) < err(holt) / 2,
      s"holt-winters ${err(hw)} not clearly better than holt ${err(holt)}")
  }

  test("autocorr: ramp is perfectly correlated at every lag, alternation " +
      "flips sign by parity, constant series yields NULL, overflow guarded") {
    import spark.implicits._
    // ramp v = t: (v_t, v_{t+k}) is an exact linear map -> r = 1
    val ramp = (0L to 40L).map(t => ("a", t, t)).toDF("k", "t", "v")
    val ra = Timeseries.autocorr(ramp, "k", "t", "v", 3).orderBy("lag").collect()
    assert(ra.map(_.getDouble(3)).toSeq == Seq(1.0, 1.0, 1.0))
    assert(ra.map(_.getLong(2)).toSeq == Seq(40L, 39L, 38L)) // pair counts
    // alternating +1/-1: r(odd lag) = -1, r(even lag) = +1
    val alt = (0L to 40L).map(t => ("a", t, if (t % 2 == 0) 1L else -1L))
      .toDF("k", "t", "v")
    val rb = Timeseries.autocorr(alt, "k", "t", "v", 2).orderBy("lag").collect()
    assert(rb(0).getDouble(3) == -1.0 && rb(1).getDouble(3) == 1.0)
    // constant series: zero variance -> NULL, never a divide-by-zero
    val const = (0L to 10L).map(t => ("a", t, 7L)).toDF("k", "t", "v")
    assert(Timeseries.autocorr(const, "k", "t", "v", 1).collect()
      .forall(_.isNullAt(3)))
    // magnitudes that would wrap the LONG sums refuse loudly
    val big = Seq(("a", 0L, 4000000000L), ("a", 1L, 4000000000L))
      .toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Timeseries.autocorr(big, "k", "t", "v", 1)
    }
  }
}
