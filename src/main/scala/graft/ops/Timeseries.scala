package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the event stream — the gap-fill /
  * rolling-statistics layer a metrics or feature pipeline runs between
  * raw events and model input.
  *
  * Both operators shuffle exactly once, on the series key: every window
  * is `partitionBy(key)`, so a 100 TB event log spreads across the
  * cluster by key and each executor fills/scans its own series
  * sequentially (Spark's window frames stream — no per-series
  * materialization beyond the frame). Per-series data volume, not total
  * volume, is the scaling bound — the natural one for per-user series.
  * All value arithmetic is integer cents (the money rule: doubles only
  * at the output boundary), so results are bit-stable across engines
  * and partitionings.
  */
object Timeseries {

  /** Resample each key's event series onto a dense hourly grid and
    * forward-fill the gaps — the "last observation carried forward"
    * regularization every dashboard / feature-store pipeline needs
    * before joining series with different clocks.
    *
    * Mechanics: per (key, hour) keep the LAST event's value (total
    * `(ts_us, event_id)` order, so the survivor is unambiguous), build
    * each key's `[min hour, max hour]` grid with one narrow
    * `sequence`+`explode` over the per-key bounds row (|keys| rows in,
    * grid rows out — never a corpus-sized shuffle), left-join the
    * observations, and carry values forward with a running
    * `last(ignoreNulls)` window. The grid is dense by construction, so
    * the first grid row of every key is its own first observation —
    * `value_filled` is never null.
    *
    * At 100 TB the join and the fill window share the by-key
    * partitioning, and AQE coalesces the sparse post-join side. For
    * multi-year grids per key, bound the sequence explosion by
    * gap-filling within coarser buckets (day files) first.
    *
    * Output: key, hour (epoch hours), `value_filled` (double, cents
    * integer ÷100 at the boundary), `observed` (1 = real event, 0 =
    * carried forward).
    */
  def gapFillHourly(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val ev = df.select(col(keyCol).as("key"),
      unix_micros(col(tsCol)).as("ts_us"), col(idCol).as("id"),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("cents"))
      // FLOOR division, not `div` (which truncates toward zero): the
      // DuckDB oracle's `//` floors, and a pre-1970 timestamp would
      // bucket one hour high under truncation — `ts_us - pmod(...)` is
      // the largest hour multiple ≤ ts_us on both signs, exactly.
      .withColumn("hour",
        expr("(ts_us - pmod(ts_us, 3600000000)) div 3600000000"))
    // last event per (key, hour) in total order — deterministic survivor
    val perHour = ev.withColumn("rn", row_number().over(
        Window.partitionBy("key", "hour").orderBy(col("ts_us").desc, col("id").desc)))
      .filter(col("rn") === 1)
      .select(col("key"), col("hour"), col("cents"))
    val grid = perHour.groupBy("key")
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("key"), explode(sequence(col("lo"), col("hi"))).as("hour"))
    val fillW = Window.partitionBy("key").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perHour, Seq("key", "hour"), "left")
      .select(col("key"), col("hour"),
        (last(col("cents"), ignoreNulls = true).over(fillW).cast("double") / 100.0)
          .as("value_filled"),
        when(col("cents").isNotNull, 1L).otherwise(0L).as("observed"))
  }

  /** Rolling z-score anomaly screen: each event's value against the
    * mean/std of its key's previous `lag` events (frame `[-lag, -1]` in
    * total `(ts_us, event_id)` order — the current row never scores
    * against itself, so an outlier can't mask its own detection).
    *
    * Engine-exact variance: the frame's sum, sum-of-squares, and count
    * are integer-cents window aggregates (exact, order-free); the
    * variance numerator `n·Σx² − (Σx)²` stays in LONG arithmetic
    * (bounded by lag·(10⁴·max_value)² — overflow-safe for any sane
    * cents range), and doubles appear only in the final
    * `(x − mean)/std` with a fixed operation order + 6-decimal
    * rounding. Rows with fewer than 2 prior events or zero variance
    * emit a null score (a constant history has no scale — flagging
    * against it would be noise), mirroring the CaseWhen lazy-branch
    * guard rule for ANSI division.
    */
  def rollingZScore(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, lag: Int): DataFrame = {
    require(lag >= 2, s"need a frame of at least 2 prior rows, got $lag")
    val ev = df.select(col(keyCol).as("key"),
      unix_micros(col(tsCol)).as("ts_us"), col(idCol).as("id"),
      floor(col(valueCol) * 100 + 0.5).cast("long").as("cents"))
    val frame = Window.partitionBy("key").orderBy(col("ts_us"), col("id"))
      .rowsBetween(-lag, -1)
    val n = count(lit(1)).over(frame)
    val s = sum(col("cents")).over(frame)
    val ss = sum(col("cents") * col("cents")).over(frame)
    val scored = ev.select(col("key"), col("id"), col("cents"),
      n.as("n"), s.as("s"), ss.as("ss"))
    val num = col("n") * col("ss") - col("s") * col("s")
    val mean = col("s").cast("double") / col("n").cast("double")
    val std = sqrt(num.cast("double") / (col("n") * col("n")).cast("double"))
    scored.select(col("key"), col("id"),
      (col("cents").cast("double") / 100.0).as("value"),
      when(col("n") >= 2 && num > 0,
        round((col("cents").cast("double") - mean) / std, 6))
        .otherwise(lit(null).cast("double")).as("zscore"))
  }

  /** EXPONENTIALLY-WEIGHTED moving average per key — the smoothing/
    * forecasting primitive (`S₁ = x₁`, `Sᵢ = α·xᵢ + (1−α)·Sᵢ₋₁`; the
    * one-step forecast is the last S). Defined as an EXACT INTEGER
    * RECURRENCE in micro-cents with round-half-up at every step
    * (`floorDiv(αµ·x + (1e6−αµ)·S + 5e5, 1e6)`) — the engine-wide
    * micro-integer convention applied to a sequential fold, so both
    * engines replay the same integers and the result is bit-stable with
    * no float-drift caveat. Overflow-safe to cents ≈ 9·10⁶ (≈ $90k per
    * value).
    *
    * Scale shape: EWMA is inherently sequential PER KEY, so the honest
    * distributed form is keys-in-parallel / sequential-within-key:
    * `flatMapSortedGroups` shuffles once on the key and streams each
    * group in `(ts, id)` order through the fold — state is one LONG, no
    * window, no per-row job. A key's history must fit one task's
    * stream (it is never collected), which holds for any per-entity
    * series; a single key spanning the whole corpus is a modeling
    * error, not a plan hazard.
    *
    * @return (key, ts_us, id, cents, ewma_micro) — `ewma_micro` in
    *         micro-cents
    */
  def ewmaSmooth(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L,
      s"alphaMicro out of (0, 1e6): $alphaMicro")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("ts_us"), col(idCol).cast("long").as("id"),
        (floor(col(valueCol) * 100 + 0.5).cast("long") * 1000000L).as("xm"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts_us"), col("id")) { (key, rows) =>
        var st = 0L
        var first = true
        rows.map { case (_, ts, id, xm) =>
          st = if (first) { first = false; xm }
          else Math.floorDiv(
            alphaMicro * xm + (1000000L - alphaMicro) * st + 500000L, 1000000L)
          (key, ts, id, xm / 1000000L, st)
        }
      }
      .toDF("key", "ts_us", "id", "cents", "ewma_micro")
  }

  /** Holt double-exponential smoothing (level + trend) as the same
    * EXACT INTEGER recurrence discipline as [[ewmaSmooth]] — the
    * forecasting primitive EWMA can't provide (EWMA lags a trending
    * series by construction; Holt's trend term closes the lag and
    * yields the standard one-step-ahead forecast `level + trend`):
    *
    *   l₁ = x₁, b₁ = 0
    *   lᵢ = ⌊(α·xᵢ + (1−α)·(l + b) + ½)/1e6⌋
    *   bᵢ = ⌊(β·(lᵢ − l) + (1−β)·b + ½)/1e6⌋
    *
    * all in micro units with FLOOR division (`Math.floorDiv`; floor of
    * the +½-shifted numerator IS round-half-up for BOTH signs, where
    * truncating division breaks down on the NEGATIVE trend numerators a
    * declining series produces — and SQL engines that truncate `//`,
    * DuckDB included, must replay the floor via
    * `⌊N/d⌋ = −((−N + d − 1) // d)` for N < 0).
    * Bit-stable across engines, restarts, and partitionings; state is
    * two LONGs per key; distributed shape is keys-in-parallel via
    * `flatMapSortedGroups` (one key shuffle, no window).
    *
    * @return (key, ts_us, id, cents, level_micro, trend_micro,
    *         forecast_micro) — forecast the one-step-ahead `l + b`
    */
  /** Holt-Winters ADDITIVE-SEASONAL smoothing — the third rung of the
    * smoothing ladder ([[ewmaSmooth]] level-only → [[holtSmooth]]
    * level+trend → this level+trend+season), for series with a known
    * period `m` (hour-of-day, day-of-week): the seasonal term absorbs
    * the repeating offset that Holt would smear into trend. Same EXACT
    * INTEGER discipline — micro units, `+½` floor division
    * (`Math.floorDiv`), bit-stable across engines/partitionings:
    *
    *   i = 1:  l = x₁, b = 0, season untouched (all-zero init)
    *   i ≥ 2:  p     = (i−1) mod m          (phase of this observation)
    *           lNew  = ⌊(α·(xᵢ − s[p]) + (1−α)·(l + b) + ½)/1e6⌋
    *           bNew  = ⌊(β·(lNew − l)  + (1−β)·b       + ½)/1e6⌋
    *           s[p]  = ⌊(γ·(xᵢ − lNew) + (1−γ)·s[p]    + ½)/1e6⌋
    *
    * One-step-ahead forecast = l + b + s[i mod m] AFTER the update —
    * the next observation's phase. Zero seasonal init (not the
    * textbook first-season average) keeps step 1 identical to Holt and
    * makes the recurrence single-pass — at 100 TB a second
    * initialization pass over every key costs a full extra shuffle for
    * an offset the γ-recurrence learns within two seasons anyway.
    *
    * State: 2 + m LONGs per key; distributed shape identical to
    * [[holtSmooth]] — one shuffle on the key, `flatMapSortedGroups`
    * streams each series in `(ts, id)` order, nothing collected.
    *
    * @return (key, ts_us, id, cents, level_micro, trend_micro,
    *         season_micro, forecast_micro) — `season_micro` is s[p]
    *         after the update (0 at i=1), forecast the one-step-ahead
    *         `l + b + s[next phase]`
    */
  def holtWinters(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, alphaMicro: Long,
      betaMicro: Long, gammaMicro: Long, period: Int): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L &&
      betaMicro > 0 && betaMicro < 1000000L &&
      gammaMicro > 0 && gammaMicro < 1000000L,
      s"smoothing params out of (0, 1e6): $alphaMicro/$betaMicro/$gammaMicro")
    require(period >= 2, s"period must be >= 2, got $period")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("ts_us"), col(idCol).cast("long").as("id"),
        (floor(col(valueCol) * 100 + 0.5).cast("long") * 1000000L).as("xm"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts_us"), col("id")) { (key, rows) =>
        var l = 0L
        var b = 0L
        val season = new Array[Long](period)
        var i = 0L
        rows.map { case (_, ts, id, xm) =>
          i += 1
          val sOut = if (i == 1L) { l = xm; b = 0L; 0L }
          else {
            val p = ((i - 1) % period).toInt
            val sPrev = season(p)
            val lNew = Math.floorDiv(
              alphaMicro * (xm - sPrev) + (1000000L - alphaMicro) * (l + b)
                + 500000L, 1000000L)
            b = Math.floorDiv(
              betaMicro * (lNew - l) + (1000000L - betaMicro) * b + 500000L,
              1000000L)
            l = lNew
            season(p) = Math.floorDiv(
              gammaMicro * (xm - lNew) + (1000000L - gammaMicro) * sPrev
                + 500000L, 1000000L)
            season(p)
          }
          val fc = l + b + season((i % period).toInt)
          (key, ts, id, xm / 1000000L, l, b, sOut, fc)
        }
      }
      .toDF("key", "ts_us", "id", "cents", "level_micro", "trend_micro",
        "season_micro", "forecast_micro")
  }

  def holtSmooth(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, alphaMicro: Long,
      betaMicro: Long): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L &&
      betaMicro > 0 && betaMicro < 1000000L,
      s"smoothing params out of (0, 1e6): $alphaMicro/$betaMicro")
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).cast("long").as("key"),
        unix_micros(col(tsCol)).as("ts_us"), col(idCol).cast("long").as("id"),
        (floor(col(valueCol) * 100 + 0.5).cast("long") * 1000000L).as("xm"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts_us"), col("id")) { (key, rows) =>
        var l = 0L
        var b = 0L
        var first = true
        rows.map { case (_, ts, id, xm) =>
          if (first) { first = false; l = xm; b = 0L }
          else {
            val lNew = Math.floorDiv(
              alphaMicro * xm + (1000000L - alphaMicro) * (l + b) + 500000L,
              1000000L)
            b = Math.floorDiv(
              betaMicro * (lNew - l) + (1000000L - betaMicro) * b + 500000L,
              1000000L)
            l = lNew
          }
          (key, ts, id, xm / 1000000L, l, b, l + b)
        }
      }
      .toDF("key", "ts_us", "id", "cents", "level_micro", "trend_micro",
        "forecast_micro")
  }

  /** Per-key AUTOCORRELATION at lags 1..maxLag — the seasonality /
    * burstiness probe run before choosing a smoothing or drift model
    * (an hourly series with r(24) ≫ r(1) wants a daily season, not an
    * EWMA). Pairs are formed by an EXACT self-equi-join on
    * `t + lag·step` (missing buckets pair with nothing — gap-fill
    * first if runs matter), every sum is exact integer arithmetic over
    * the paired values, and Pearson r is ONE double expression over
    * those six integer sums, micro-rounded to 6 — so two engines agree
    * bit-for-bit. A zero-variance side (constant series) yields NULL,
    * never a divide-by-zero.
    *
    * Scale shape: the self-join is a shuffle on `(key, t)` — the
    * series table, typically orders of magnitude smaller than the
    * events it bucketed — and everything after is partial-aggregable.
    *
    * @param series `(keyCol, tCol: long bucket index, vCol: long)`
    * @return (key, lag, n_pairs, r)
    */
  def autocorr(series: DataFrame, keyCol: String, tCol: String,
      vCol: String, maxLag: Int, step: Long = 1L): DataFrame = {
    require(maxLag >= 1 && step >= 1, s"autocorr: bad lag/step $maxLag/$step")
    val base = series.select(col(keyCol).as("key"),
      col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v"))
    // the exact-integer claim needs Σv² (and every other sum) inside
    // LONG: guard n·max(v)² < 2⁶² loudly — a wrapped sum would diverge
    // from an exact-arithmetic oracle SILENTLY, the one failure mode
    // this op exists to exclude. One tiny aggregate over the series
    // (bucketed, orders of magnitude smaller than what it summarizes).
    val bound = base.agg(max(abs(col("v"))).as("mx"),
      count(lit(1)).as("n")).head()
    if (!bound.isNullAt(0)) {
      val (mx, n) = (math.max(bound.getLong(0), 1L), bound.getLong(1))
      require(mx < 3037000499L && (java.lang.Long.MAX_VALUE / mx) / mx > n,
        s"autocorr: n=$n values up to $mx would overflow the exact " +
          "LONG sums (n·max(v)² ≥ 2⁶³) — pre-scale the series")
    }
    val lagged = base.select(col("key"), col("t").as("t2"), col("v").as("w"))
      .crossJoin(broadcast(series.sparkSession.range(1, maxLag + 1)
        .select(col("id").as("lag"))))
      .select(col("key"), col("lag"), (col("t2") - col("lag") * lit(step)).as("t"),
        col("w"))
    val sums = base.join(lagged, Seq("key", "t"))
      .groupBy(col("key"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("v")).as("sx"), sum(col("w")).as("sy"),
        sum(col("v") * col("v")).as("sxx"),
        sum(col("w") * col("w")).as("syy"),
        sum(col("v") * col("w")).as("sxy"))
    val n = col("n_pairs").cast("double")
    val covN = n * col("sxy") - col("sx") * col("sy")
    val varX = n * col("sxx") - col("sx") * col("sx")
    val varY = n * col("syy") - col("sy") * col("sy")
    sums.select(col("key"), col("lag"), col("n_pairs"),
      when(varX > 0 && varY > 0,
        round(covN / sqrt(varX * varY), 6)).as("r"))
  }
}
