package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured Streaming over the events table: the idiomatic upgrade of
  * the reference's orchestration-level micro-batching (SURVEY.md §2.5 —
  * Cloud Scheduler + Pub/Sub firing independent batch runs). Here the
  * stream is first-class: watermarked event-time windows with late-data
  * handling, plus a stateful sessionization operator.
  *
  * At scale this runs unchanged against a Kafka source — the transforms
  * are source-agnostic; tests drive it with a file source +
  * `Trigger.AvailableNow` and a memory sink.
  */
object EventsStream {

  /** File-based event stream with proper event-time ts (the sf dirs keep
    * one file per table, so the stream source reads the directory with a
    * glob filter — FileStreamSource requires a directory path).
    *
    * The stream source requires an explicit schema, and the driver's
    * generator has shipped `ts` under more than one physical encoding
    * (int64 nanos, TIMESTAMP_NTZ micros — see
    * [[graft.io.Tables.normalizeEventTs]]). Hard-coding one encoding
    * silently corrupts event time when the data changes (a ÷1000 applied
    * to micros collapses the whole corpus to January 1970), so probe the
    * batch reader's schema of the same file — one driver-side footer
    * read, no data scan — use it as the stream schema, and route the
    * decode through the canonical normalizer.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val physical = spark.read.parquet(s"$dir/events.parquet").schema
    graft.io.Tables.normalizeEventTs(
      spark.readStream.schema(physical)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Ingest + watermark accounting for a bounded streaming run (the
    * observability a production stream exports continuously; here it
    * doubles as a gate: see [[auditOf]]).
    */
  final case class StreamAudit(inputRows: Long, minTsMicros: Long,
      maxTsMicros: Long, droppedByWatermark: Long)

  /** Per-operator state-store accounting from a bounded run's FINAL
    * progress: rows resident, rows updated in the last batch, bytes
    * held. The unbounded-state companion to [[StreamAudit]]'s ingest
    * span: a stateful operator whose state scales with EVENTS instead
    * of windows/keys (a lost watermark, a key leak, a non-evicting
    * join condition) shows up here as `rowsTotal` tracking input volume
    * — the gates pin `rowsTotal` to the batch-computed group count, so
    * the regression fails loudly instead of OOMing a real cluster
    * three weeks in.
    */
  final case class StateOpAudit(operator: String, rowsTotal: Long,
      rowsUpdated: Long, memoryBytes: Long)

  /** State-operator audit of a finished bounded query: the last progress
    * entry that carries state operators (the final batch — earlier
    * entries see partially-loaded state). Empty for stateless queries.
    */
  def stateAuditOf(
      q: org.apache.spark.sql.streaming.StreamingQuery): Seq[StateOpAudit] =
    q.recentProgress.reverse.find(_.stateOperators.nonEmpty).toSeq
      .flatMap(_.stateOperators.toSeq)
      .map(so => StateOpAudit(so.operatorName, so.numRowsTotal,
        so.numRowsUpdated, so.memoryUsedBytes))

  /** [[runToMemory]] that also returns the final state-operator audit —
    * the test/tooling entry for asserting state-size conservation laws.
    */
  def runToMemoryAudited(spark: SparkSession, streamed: DataFrame,
      name: String, mode: OutputMode = OutputMode.Append)
      : (DataFrame, Seq[StateOpAudit]) = {
    val q = streamed.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (spark.table(name), stateAuditOf(q))
  }

  /** Attach an event-time observation point to the events stream:
    * row count + min/max event time (epoch micros), computed as
    * micro-batch accumulators inside the existing plan — `observe()` adds
    * NO shuffle and no extra pass, and the metrics surface through every
    * progress event. The decode-collapse failure mode (a wrong ts unit
    * shrinking the corpus's event-time span ~1000×) is invisible to row
    * counts but glaring in min/max — which is why the audit tracks the
    * span, not just volume.
    */
  def observeEvents(events: DataFrame, obsName: String): DataFrame =
    events.observe(obsName, count(lit(1)).as("n"),
      min(unix_micros(col("ts"))).as("min_ts_us"),
      max(unix_micros(col("ts"))).as("max_ts_us"))

  /** Fold a finished bounded query's progress log into a [[StreamAudit]]:
    * observed rows/span from [[observeEvents]] plus every state
    * operator's rows-dropped-by-watermark. Reads `recentProgress`
    * (synchronous after `awaitTermination` — no listener race; retains
    * the last 100 progress updates, far above an `AvailableNow` run's
    * batch count). The q9/q35 gates REQUIRE a clean audit against the
    * batch-read truth: dropped == 0 (single-file AvailableNow replay —
    * nothing arrives late) and identical count/min/max (any decode or
    * watermark bug breaks one of the four before the result hash can
    * even be compared).
    */
  def auditOf(q: org.apache.spark.sql.streaming.StreamingQuery,
      obsName: String): StreamAudit = {
    val progs = q.recentProgress
    val obs = progs.flatMap(p => Option(p.observedMetrics.get(obsName)))
      .filter(r => !r.isNullAt(0) && r.getLong(0) > 0)
    val dropped = progs.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    StreamAudit(
      inputRows = obs.map(_.getLong(0)).sum,
      minTsMicros = if (obs.isEmpty) Long.MinValue else obs.map(_.getLong(1)).min,
      maxTsMicros = if (obs.isEmpty) Long.MaxValue else obs.map(_.getLong(2)).max,
      droppedByWatermark = dropped)
  }

  /** Hourly tumbling-window aggregate per event type, 2-hour watermark:
    * the streaming mirror of SparkEntry's `q5_events_hourly` batch query.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // exact money sum as integral hundredths (values are exact
      // 2-decimal) — primitive LONG state, no per-row Decimal.toPrecision
      // in the stateful operator, and ÷100 is one double op at emit
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).as("tv_cents"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), (col("tv_cents").cast("double") / lit(100d)).as("total_value"))

  /** HOPPING (sliding) windows — 1-hour windows advancing every 30
    * minutes, so each event lands in exactly two overlapping windows:
    * the smoothing aggregation tumbling windows can't express (a spike
    * at :29 splits across tumbling buckets; the hop sees it whole).
    * Same watermark/state discipline as [[hourlyAgg]]; state size is
    * windows×types, 2× tumbling for the same horizon. Window starts are
    * emitted as epoch SECONDS (the engine-wide timestamp-output rule).
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).as("tv_cents"))
      .select(unix_timestamp(col("window.start")).as("win_start"), col("event_type"),
        col("n_events"), (col("tv_cents").cast("double") / lit(100d)).as("total_value"))

  /** Stream-STATIC enrichment join + running aggregate: the stream joins
    * a static dimension frame (customer → market segment) and totals per
    * (segment, event_type) — the standard "enrich events with reference
    * data" shape. Stream-static inner joins are STATELESS on the stream
    * side (each micro-batch probes the static relation — broadcast by
    * Catalyst when small — nothing is buffered across batches, no
    * watermark needed); only the downstream aggregate keeps state, and
    * at 100 TB/day that state is |segments × event types| rows. Exact
    * integral-cents money totals, the engine-wide convention.
    */
  def segmentTotals(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, events("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).as("tv_cents"))
      .select(col("c_mktsegment").as("segment"), col("event_type"),
        col("n_events"), (col("tv_cents").cast("double") / lit(100d)).as("total_value"))

  /** Per-user session ids: a new session starts after `gapMinutes` of
    * inactivity. Stateful flatMapGroupsWithState-free formulation for the
    * batch mirror; the streaming form uses session windows.
    */
  def sessionizedBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_session")
  }

  /** Streaming session windows (native `session_window`, watermark-driven
    * state eviction).
    */
  def sessionAgg(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).cast("double") / lit(100d))
          .as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Custom arbitrary-state operator: running per-user event count + value
    * total via `flatMapGroupsWithState` (Update mode). The state store keys
    * by user — at scale this shuffles once on user_id and state lives in
    * the executor-local RocksDB/HDFS-backed store, emitting one updated
    * row per user per micro-batch.
    *
    * State-bound audit (deliberate NoTimeout): unlike
    * [[lastTouchAttribution]]'s lookback — which gives a natural horizon
    * past which state is provably dead and therefore gets an
    * `EventTimeTimeout` TTL — LIFETIME running totals are the operator's
    * contract: evicting a user would silently reset their totals on the
    * next event, breaking the q13 gate's exact batch equality. State is
    * O(distinct users) at 16 bytes of payload per key (two LONGs), not
    * O(events) — the EventsStreamSpec state law pins resident rows to the
    * distinct-user count. A deployment needing bounded state should window
    * the totals upstream (group on `(user, window)` with a watermark)
    * rather than TTL-ing lifetime semantics.
    */
  def runningUserStats(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // state carries exact integral cents (the engine-wide money
    // convention): the running total is then arrival-order-independent,
    // so the final emission is exactly the batch aggregate — gate-able
    // against SQL, not just count-comparable
    events.select(col("user_id").cast("long"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) { (uid, rows, state) =>
        var (c, v) = state.getOption.getOrElse((0L, 0L))
        rows.foreach { case (_, cents) => c += 1; v += cents }
        state.update((c, v))
        Iterator((uid, c, v.toDouble / 100d))
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** STREAMING incremental-view maintenance with RETRACTIONS — the
    * q56 Z-set fold run through the real micro-batch engine: the input
    * is a CDC delta stream `(op ∈ {I, D}, user_id, cents)` and per-user
    * state is the maintained `(n, cents)` view, folded with signed
    * multiplicities (+1/−1). Spark's built-in streaming aggregation
    * cannot express this (it has no retraction input path); arbitrary
    * state can. The fold is COMMUTATIVE, so unlike [[lastTouchAttribution]]
    * no slice-order contract is needed — any interleaving of the log
    * converges to the same state, which is exactly what makes the
    * batch-recompute gate meaningful. Update mode emits the view row
    * each time a user's state changes, tagged with the monotone
    * per-user delta count so the caller can select the final emission
    * deterministically. Deliberate NoTimeout, like [[runningUserStats]]:
    * the maintained view IS lifetime state (O(users) × three LONGs);
    * evicting a key would silently reset its view.
    */
  def maintainedUserStats(deltas: DataFrame): DataFrame = {
    import deltas.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    deltas.select(col("user_id").cast("long"),
        when(col("op") === "I", lit(1L))
          .when(col("op") === "D", lit(-1L))
          .otherwise(raise_error(concat(lit("maintainedUserStats: unknown op '"),
            col("op"), lit("'"))).cast("long")).as("sgn"),
        col("cents").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) { (uid, rows, state) =>
        var (n, cents, seen) = state.getOption.getOrElse((0L, 0L, 0L))
        rows.foreach { case (_, sgn, c) => n += sgn; cents += sgn * c; seen += 1 }
        state.update((n, cents, seen))
        Iterator((uid, n, cents, seen))
      }
      .toDF("user_id", "n", "cents", "n_deltas")
  }

  /** STREAMING exact-integer EWMA — [[graft.ops.Timeseries.ewmaSmooth]]'s
    * sequential fold as an ORDER-SENSITIVE stateful operator (the q55
    * pattern applied to smoothing): per-user state is the single LONG
    * micro-cent EWMA value, each event emits its smoothed row as it
    * streams, and because the recurrence is integer-exact the streamed
    * output can be gated BIT-FOR-BIT against the batch op — the payoff
    * of defining EWMA as integers instead of floats, where stream/batch
    * fold orders would drift. Same caller contracts as
    * [[lastTouchAttribution]]: ts-range slice files keep cross-batch
    * event order, the in-group sort fixes shuffle order within a batch.
    * Deliberate NoTimeout ([[runningUserStats]]' reasoning): a lifetime
    * smoothing state has no natural horizon; evicting a key would
    * restart its series.
    *
    * Expects `(user_id, ts_us, event_id, cents)`; returns
    * `(user_id, ts_us, event_id, cents, ewma_micro)`.
    */
  def ewmaStream(events: DataFrame, alphaMicro: Long): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(alphaMicro > 0 && alphaMicro < 1000000L,
      s"alphaMicro out of (0, 1e6): $alphaMicro")
    events.select(col("user_id").cast("long"), col("ts_us").cast("long"),
        col("event_id").cast("long"), col("cents").cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Boolean), (Long, Long, Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (uid, rows, state) =>
        var (st, seeded) = state.getOption.getOrElse((0L, false))
        val out = rows.toArray.sortBy(r => (r._2, r._3)).map {
          case (_, ts, id, cents) =>
            val xm = cents * 1000000L
            st = if (!seeded) { seeded = true; xm }
            else Math.floorDiv(
              alphaMicro * xm + (1000000L - alphaMicro) * st + 500000L, 1000000L)
            (uid, ts, id, cents, st)
        }
        state.update((st, seeded))
        out.iterator
      }
      .toDF("user_id", "ts_us", "event_id", "cents", "ewma_micro")
  }

  /** Streaming last-touch attribution — q54's batch as-of credit as an
    * ORDER-SENSITIVE stateful operator: per-user state is the single
    * latest view/click seen so far (`(ts_us, event_id, type)` — a few
    * dozen bytes per user, bounded by the user population, never by
    * stream length), and each purchase emits its credit against that
    * state the moment it is processed. This is the stateful shape the
    * order-FREE windowed aggregates can't express: the answer depends
    * on the event sequence, so correctness needs (a) event-time-sliced
    * micro-batches (the caller feeds ts-range files in order — same
    * contract d13's nightly slices satisfy) and (b) an in-batch sort of
    * each group's iterator, which arrives in shuffle order, not event
    * order.
    *
    * Tie semantics replicate the batch op exactly: within one event
    * timestamp, touches are absorbed BEFORE purchases emit (inclusive
    * as-of), and competing same-ts touches resolve by the
    * `(ts, event_id, type)` maximum — q54's payload-struct max. The
    * caller's slicing must not split one timestamp across batches
    * (ts-range cuts guarantee this by construction).
    *
    * Expects `(event_id, user_id, ts_us, event_type, cents)`; returns
    * one row per purchase, NULL-touch when nothing precedes within
    * `lookbackUs`.
    *
    * STATE TTL: per-user state is one touch, but with no eviction the
    * store would grow with ever-seen users forever — the classic
    * state-store OOM at 100× users on an unbounded stream. The operator
    * therefore watermarks event time (0s delay — the caller's ordered
    * ts-range slices admit no late data) and arms an `EventTimeTimeout`
    * at `latest_touch + lookback`: once the watermark passes that, the
    * touch could no longer credit ANY future purchase (a later purchase's
    * event time is ≥ the watermark that evicted it), so dropping the
    * state row cannot change the output — batch equality stays
    * bit-for-bit while resident state tracks only users with a
    * still-creditable touch.
    */
  def lastTouchAttribution(events: DataFrame, lookbackUs: Long): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    require(lookbackUs > 0, s"lookbackUs must be positive: $lookbackUs")
    events.select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("ts_us").cast("long"), col("event_type"), col("cents").cast("long"),
        timestamp_micros(col("ts_us").cast("long")).as("evt_ts"))
      .withWatermark("evt_ts", "0 seconds")
      .as[(Long, Long, Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long, String),
          (Long, Long, Long, Option[Long], Option[String], Option[Long], Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) { (uid, rows, state) =>
        if (state.hasTimedOut) {
          // watermark passed latest_touch + lookback: no future purchase
          // can credit this touch — evict and emit nothing
          state.remove()
          Iterator.empty
        } else {
        val evs = rows.toArray.sortBy(r => (r._3, r._1))
        var latest: Option[(Long, Long, String)] = state.getOption
        def better(c: (Long, Long, String)): Boolean = latest.forall { l =>
          c._1 > l._1 || (c._1 == l._1 &&
            (c._2 > l._2 || (c._2 == l._2 && c._3 > l._3)))
        }
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Option[Long], Option[String], Option[Long], Long)]
        var i = 0
        while (i < evs.length) {
          val ts = evs(i)._3
          var j = i
          while (j < evs.length && evs(j)._3 == ts) j += 1
          // inclusive as-of: absorb this timestamp's touches first
          var k = i
          while (k < j) {
            val e = evs(k)
            if (e._4 == "view" || e._4 == "click") {
              val cand = (e._3, e._1, e._4)
              if (better(cand)) latest = Some(cand)
            }
            k += 1
          }
          k = i
          while (k < j) {
            val e = evs(k)
            if (e._4 == "purchase") {
              val hit = latest.filter(l => e._3 - l._1 <= lookbackUs)
              out += ((e._1, uid, e._3, hit.map(_._2), hit.map(_._3),
                hit.map(_._1), e._5))
            }
            k += 1
          }
          i = j
        }
        latest.foreach { l =>
          state.update(l)
          // TTL: evictable once the watermark passes touch + lookback
          // (+1 ms so µs→ms truncation never evicts a still-live touch);
          // clamped above the current watermark because Spark rejects
          // timeouts at/behind it (an already-expired touch carried in
          // state evicts at the next watermark advance)
          val ttlMs = l._1 / 1000L + lookbackUs / 1000L + 1L
          state.setTimeoutTimestamp(math.max(ttlMs, state.getCurrentWatermarkMs() + 1L))
        }
        out.iterator
        }
      }
      .toDF("event_id", "user_id", "ts_us", "touch_event", "touch_type",
        "touch_ts_us", "credit_cents")
  }

  /** Stream-stream interval self-join: every purchase joined to the same
    * user's views in the preceding hour — the attribution-join shape.
    * Both sides carry watermarks and the join condition bounds the event
    * time range, so each side's join state is evicted once the watermark
    * passes `purchase_ts − 1 hour` (views) / `purchase_ts` (purchases):
    * state size tracks the delay window × arrival rate, not stream
    * history. Append mode; shuffles once on user_id per side.
    *
    * Arrival-order caveat (inherent to watermarked stream-stream joins,
    * not this formulation): a view arriving more than the 2-hour
    * watermark delay LATER than the stream's event-time frontier is
    * dropped from state and cannot match a subsequent purchase — the
    * streaming result equals the batch join only when each side arrives
    * within its allowed lateness. The q17 gate satisfies this
    * structurally: the fixture is one parquet file, which
    * `Trigger.AvailableNow` (file source, `maxFilesPerTrigger` ≥ 1)
    * processes as a single micro-batch, so no state is evicted before
    * its matches arrive. Feeding this from a source that slices batches
    * out of event-time order requires the watermark delay to cover that
    * disorder.
    */
  def purchaseViewJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(views,
      col("view_user") === col("user_id") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        col("purchase_ts"), col("view_ts"), col("value"))
  }

  /** LEFT OUTER variant of [[purchaseViewJoin]]: purchases with no view
    * in the preceding hour still emit (null view columns) — but only
    * once the watermark passes the purchase's match window, when the
    * engine can PROVE no matching view can still arrive. Consequence:
    * in a bounded run, purchases newer than the final watermark
    * terminate still in state — their null row is withheld, so the
    * streaming result is the batch inner join plus only the
    * *provably*-unmatched tail. That is correct streaming semantics,
    * not data loss: a restart with more data resumes exactly where the
    * watermark left off. The q78 gate closes the gap with a sentinel
    * slice past every purchase's window (+delay), making the bounded
    * streamed result equal the batch LEFT JOIN bit-for-bit; the
    * exactly-once-after-expiry law (a null row neither emits early nor
    * re-emits on later batches) is spec-gated in EventsStreamSpec.
    */
  def purchaseViewJoinOuter(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(views,
      col("view_user") === col("user_id") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"),
      "leftOuter")
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        col("purchase_ts"), col("view_ts"), col("value"))
  }

  /** FULL OUTER variant of [[purchaseViewJoin]]: both sides' unmatched
    * rows emit once the watermark proves their match windows closed — a
    * purchase with no view in its preceding hour (null view columns)
    * AND a view no purchase followed within an hour (null purchase
    * columns). Same eviction mechanics as [[purchaseViewJoinOuter]]:
    * a view's state is releasable once the watermark passes
    * `view_ts + 1 hour` (no purchase that could still arrive matches
    * it), a purchase's once it passes `purchase_ts`. The q80 gate
    * equates the bounded streamed result with the batch FULL JOIN via
    * the q78 dual-branch sentinel discipline.
    */
  def purchaseViewJoinFullOuter(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(views,
      col("view_user") === col("user_id") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"),
      "fullOuter")
      .select(col("purchase_id"), col("view_id"),
        coalesce(col("user_id"), col("view_user")).as("user_id"),
        col("purchase_ts"), col("view_ts"), col("value"))
  }

  /** LEFT SEMI variant of [[purchaseViewJoin]]: purchases that had AT
    * LEAST ONE same-user view in the preceding hour, emitted once —
    * the existence-check join (conversion-with-prior-engagement) whose
    * output never fans out on match multiplicity. Emission is eager on
    * first match, so unlike the outer variants no watermark-expiry
    * flush is needed for correctness of the EMITTED set; state still
    * evicts on the same schedule as the inner join.
    */
  def purchaseViewJoinSemi(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(views,
      col("view_user") === col("user_id") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"),
      "leftSemi")
  }

  /** Streaming exact dedup with bounded state: drops re-deliveries of the
    * same key arriving within the watermark delay
    * (`dropDuplicatesWithinWatermark` — state for a key is evicted once the
    * watermark passes it, so state size is bounded by the delay window ×
    * key arrival rate, not by stream history; the right shape for
    * at-least-once sources like Kafka at 100 TB/day).
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)

  /** Ephemeral checkpoint location for bounded memory-sink runs: the
    * checkpoint of an `AvailableNow` gate/test query has no replay value
    * (the result is re-derived from source every run), so it goes to
    * tmpfs when available — state-store and WAL commits then cost a
    * memcpy, not a disk fsync (4 join-state stores × partitions × fsync
    * adds whole seconds per run on disk /tmp). UNIQUE per call: reusing
    * a checkpoint would make a restarted query see "no new data" and
    * emit nothing. Production queries pass a durable location instead.
    */
  def ephemeralCheckpoint(prefix: String): String = {
    val shm = new java.io.File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    s"$base/graft-ckpt/$prefix-${java.util.UUID.randomUUID()}"
  }

  /** Best-effort recursive cleanup of an [[ephemeralCheckpoint]] dir. */
  def dropEphemeralCheckpoint(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    val f = new java.io.File(path)
    // refuse to delete anything outside the graft-ckpt namespace
    if (f.getAbsolutePath.contains("/graft-ckpt/")) rm(f)
  }

  /** `foreachBatch` parquet sink (SURVEY §2.5's idiomatic upgrade of the
    * reference's per-run dated files): each micro-batch lands under
    * `batch_id=<n>/`, so a replayed batch OVERWRITES its own directory
    * instead of double-appending — exactly-once output on top of the
    * at-least-once foreachBatch contract, with no global overwrite of
    * earlier batches. Any batch transform (joins against batch tables,
    * merges) can run inside the closure; this is the streaming→lakehouse
    * bridge a 100 TB ingest uses when the sink has no native streaming
    * writer.
    */
  def foreachBatchParquet(streamed: DataFrame, path: String): DataStreamWriter[Row] =
    streamed.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .trigger(Trigger.AvailableNow())

  /** Drive a streaming frame to completion into a memory sink; returns the
    * materialized result (test/tooling helper).
    */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streamed.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }
}
