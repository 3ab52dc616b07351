package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSpec {

  test("streaming hourly agg matches the batch mirror (sf0.001)") {
    // Complete mode: Append would (correctly) withhold windows newer than
    // the final watermark, so the full-equality mirror needs Complete
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.hourlyAgg(EventsStream.readEvents(spark, sf0001)), "hourly_out",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val batch = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).cast("double") / lit(100d))
          .as("total_value"))
    // AvailableNow drains everything; watermark cannot drop rows in a
    // single batch over sorted synthetic data — results must be identical
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty)
  }

  test("lastTouchAttribution: state carries across batches; ties, lookback, null-touch") {
    import spark.implicits._
    val base = "/tmp/graft_io/spec_q55/in"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(base))
    // (event_id, user_id, ts_us, type, cents)
    // batch 1 (ts < 100): u1 click@10; u2 view@20; u1 purchase@10 (same-ts
    //   inclusive tie -> credits click 1); u2 purchase@90 -> view 2
    // batch 2 (ts >= 100): u1 purchase@120 -> STATE-carried click 1;
    //   u2 view@200 then purchase@1300 -> lookback (1000) expired -> NULL;
    //   u3 purchase@150 with no touch ever -> NULL
    val b1 = Seq((1L, 1L, 10L, "click", 0L), (2L, 2L, 20L, "view", 0L),
      (3L, 1L, 10L, "purchase", 500L), (4L, 2L, 90L, "purchase", 700L))
    val b2 = Seq((5L, 1L, 120L, "purchase", 900L), (6L, 2L, 200L, "view", 0L),
      (7L, 2L, 1300L, "purchase", 300L), (8L, 3L, 150L, "purchase", 100L))
    def write(rows: Seq[(Long, Long, Long, String, Long)], name: String,
        mtime: Long): Unit = {
      val tmp = new java.io.File(s"$base/$name.tmp")
      rows.toDF("event_id", "user_id", "ts_us", "event_type", "cents")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$base/$name.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      rm(tmp); target.setLastModified(mtime): Unit
    }
    write(b1, "b1", 1000000000000L)
    write(b2, "b2", 1000000060000L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType)))
    val ckpt = EventsStream.ephemeralCheckpoint("spec_q55")
    val q = EventsStream.lastTouchAttribution(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(base), lookbackUs = 1000L)
      .writeStream.format("memory").queryName("spec_q55_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    EventsStream.dropEphemeralCheckpoint(ckpt)
    val out = spark.table("spec_q55_out").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[String]), r.getLong(6)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (3L, Some(1L), Some("click"), 500L), // same-ts inclusive tie
      (4L, Some(2L), Some("view"), 700L),
      (5L, Some(1L), Some("click"), 900L), // state carried from batch 1
      (7L, None, None, 300L),              // lookback expired
      (8L, None, None, 100L)),             // never touched
      out.toString)
  }

  test("purchaseViewJoinOuter law: an unmatched purchase's null row is " +
      "withheld until the watermark proves expiry, then emits exactly once") {
    import spark.implicits._
    val H = 3600000000L // one hour in micros
    // P1/V1 (user 1): inner match at 10:00/10:30. P2 (user 9): purchase at
    // 10:00 with no view ever — the null-row subject.
    val b1 = Seq((1L, 1L, 10L * H, "view", 0.0),
      (2L, 1L, 10L * H + H / 2, "purchase", 5.0),
      (3L, 9L, 10L * H, "purchase", 7.0))
    // b2 advances the watermark to 18:00 (> P2's ts + its window), proving
    // no matching view can arrive; b3 is a later batch AFTER expiry — the
    // null row must not re-emit in it. Each advancing batch carries BOTH a
    // view and a purchase (distinct users, matching nothing): the two
    // withWatermark branches track separate event-time maxima and the
    // GLOBAL watermark is their MIN, so a views-only batch stalls the
    // purchase branch and nothing ever flushes.
    val b2 = Seq((4L, 8L, 20L * H, "view", 0.0),
      (40L, 7L, 20L * H, "purchase", 0.0))
    val b3 = Seq((5L, 8L, 30L * H, "view", 0.0),
      (50L, 6L, 30L * H, "purchase", 0.0))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    def run(name: String, slices: Seq[(Seq[(Long, Long, Long, String, Double)], Long)])
        : Seq[(Long, Option[Long])] = {
      val base = s"/tmp/graft_io/spec_q78_$name/in"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(base))
      slices.zipWithIndex.foreach { case ((rows, mtime), i) =>
        val tmp = new java.io.File(s"$base/b$i.tmp")
        rows.toDF("event_id", "user_id", "ts_us", "event_type", "value")
          .select(col("event_id"), col("user_id"),
            timestamp_micros(col("ts_us")).as("ts"), col("event_type"), col("value"))
          .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val target = new java.io.File(s"$base/b$i.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        rm(tmp); target.setLastModified(mtime): Unit
      }
      val ckpt = EventsStream.ephemeralCheckpoint(s"spec_q78_$name")
      val q = EventsStream.purchaseViewJoinOuter(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(base))
        .writeStream.format("memory").queryName(s"spec_q78_${name}_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      EventsStream.dropEphemeralCheckpoint(ckpt)
      spark.table(s"spec_q78_${name}_out").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .sortBy(r => (r._1, r._2.getOrElse(-1L))).toSeq
    }
    // bounded run over b1 only: the inner match emits; P2's null row is
    // WITHHELD (the engine cannot yet prove no view will arrive)
    val early = run("early", Seq((b1, 1000000000000L)))
    assert(early == Seq((2L, Some(1L))), early.toString)
    // full run: watermark passes P2's window after b2; b3 runs after
    // expiry. Exactly ONE null row for P2 — not zero (withheld), not two
    // (re-emit on b3). Sentinel purchases (ids 40/50) are dropped from
    // the assertion: their own null rows legitimately flush whenever a
    // later batch passes THEIR windows.
    val full = run("full", Seq((b1, 1000000000000L),
      (b2, 1000000060000L), (b3, 1000000120000L)))
      .filter(_._1 <= 3L)
    assert(full == Seq((2L, Some(1L)), (3L, None)), full.toString)
  }

  test("lastTouchAttribution TTL law: expired touches leave the state store") {
    import spark.implicits._
    val base = "/tmp/graft_io/spec_q55_ttl/in"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(base))
    // lookback = 1000 µs. b1 seeds touches for u1 and u2; b2's purchases
    // arrive far past the lookback (u1 -> NULL) and u2 re-touches; b3's
    // u2 purchase credits within lookback. The watermark (0s delay) walks
    // the slice maxima, so u1's touch (TTL 1002 ms) expires once b3 runs
    // under watermark 6000 ms — WITHOUT EventTimeTimeout eviction the
    // final state would hold 2 rows; the law demands exactly 1 (u2).
    val b1 = Seq((1L, 1L, 1000000L, "view", 0L), (2L, 2L, 2000000L, "view", 0L))
    val b2 = Seq((3L, 1L, 5000000L, "purchase", 500L),
      (4L, 2L, 6000000L, "view", 0L))
    val b3 = Seq((5L, 2L, 6000800L, "purchase", 300L))
    def write(rows: Seq[(Long, Long, Long, String, Long)], name: String,
        mtime: Long): Unit = {
      val tmp = new java.io.File(s"$base/$name.tmp")
      rows.toDF("event_id", "user_id", "ts_us", "event_type", "cents")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$base/$name.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      rm(tmp); target.setLastModified(mtime): Unit
    }
    write(b1, "b1", 1000000000000L)
    write(b2, "b2", 1000000060000L)
    write(b3, "b3", 1000000120000L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType)))
    val ckpt = EventsStream.ephemeralCheckpoint("spec_q55_ttl")
    val q = EventsStream.lastTouchAttribution(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(base), lookbackUs = 1000L)
      .writeStream.format("memory").queryName("spec_q55_ttl_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val st = EventsStream.stateAuditOf(q)
    EventsStream.dropEphemeralCheckpoint(ckpt)
    val out = spark.table("spec_q55_ttl_out").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(6)))
      .sortBy(_._1).toSeq
    // output semantics unchanged by eviction: expired touch -> NULL,
    // live touch -> credited
    assert(out == Seq((3L, None, 500L), (5L, Some(4L), 300L)), out.toString)
    // the law: u1's touch expired (watermark 6000 ms > TTL 1002 ms) and
    // was EVICTED; only u2's live touch remains resident
    assert(st.map(_.rowsTotal).sum == 1L,
      s"state rows ${st.map(_.rowsTotal).sum} != 1 — expired touch not evicted: $st")
  }

  test("maintainedUserStats: Z-set fold is order-free — deletes-first converges") {
    import spark.implicits._
    def run(tag: String, slices: Seq[(Seq[(String, Long, Long)], Long)]): Map[Long, (Long, Long)] = {
      val base = s"/tmp/graft_io/spec_q60_$tag/in"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(base))
      slices.zipWithIndex.foreach { case ((rows, mtime), i) =>
        val tmp = new java.io.File(s"$base/s$i.tmp")
        rows.toDF("op", "user_id", "cents").coalesce(1)
          .write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        val target = new java.io.File(s"$base/s$i.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        rm(tmp); target.setLastModified(mtime): Unit
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cents", org.apache.spark.sql.types.LongType)))
      val ckpt = EventsStream.ephemeralCheckpoint(s"spec_q60_$tag")
      val q = EventsStream.maintainedUserStats(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(base))
        .writeStream.format("memory").queryName(s"spec_q60_${tag}_out")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      EventsStream.dropEphemeralCheckpoint(ckpt)
      spark.table(s"spec_q60_${tag}_out")
        .groupBy("user_id")
        .agg(max(struct(col("n_deltas"), col("n"), col("cents"))).as("f"))
        .select(col("user_id"), col("f.n"), col("f.cents"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    val ins = Seq(("I", 1L, 100L), ("I", 1L, 50L), ("I", 2L, 30L))
    val del = Seq(("D", 1L, 50L), ("D", 2L, 30L))
    val fwd = run("fwd", Seq((ins, 1000000000000L), (del, 1000000060000L)))
    // deletes BEFORE their inserts: state dips negative mid-stream but
    // the commutative fold lands on the identical end state
    val rev = run("rev", Seq((del, 1000000000000L), (ins, 1000000060000L)))
    assert(fwd == rev, s"fwd=$fwd rev=$rev")
    assert(fwd(1L) == ((1L, 100L)) && fwd(2L) == ((0L, 0L)), fwd.toString)
  }

  test("streaming hopping agg: every event lands in exactly two windows") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.hoppingAgg(EventsStream.readEvents(spark, sf0001)), "hopping_out",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    // batch mirror: duplicate each event into its two half-hour starts
    val e = Tables.events(spark, sf0001)
      .select(col("event_type"),
        floor(col("value") * lit(100d) + lit(0.5d)).cast("long").as("cents"),
        (expr("unix_timestamp(ts) div 1800") * 1800).as("w0"))
    val batch = e.select(col("w0").as("win_start"), col("event_type"), col("cents"))
      .unionByName(e.select((col("w0") - 1800).as("win_start"), col("event_type"), col("cents")))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum(col("cents")).cast("double") / lit(100d)).as("total_value"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // window-count invariant: sum of n_events = 2 × event count
    val total = streamed.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == 2 * Tables.events(spark, sf0001).count())
  }

  test("stream audit: observed rows/span match batch truth; a collapsed decode is caught") {
    // clean run: the observed ingest equals the batch reader's truth
    val src = EventsStream.observeEvents(EventsStream.readEvents(spark, sf0001), "audit_in")
    val q = EventsStream.hourlyAgg(src)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("audit_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val audit = EventsStream.auditOf(q, "audit_in")
    val truth = Tables.events(spark, sf0001)
      .agg(count(lit(1)), min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    assert(audit.droppedByWatermark == 0L)
    assert(audit.inputRows == truth.getLong(0))
    assert(audit.minTsMicros == truth.getLong(1) && audit.maxTsMicros == truth.getLong(2))

    // simulated decode collapse (the round-8 failure: micros re-divided by
    // 1000): row count still matches, but the event-time span shrinks
    // ~1000× — exactly the signal the span check trips on
    val collapsed = EventsStream.observeEvents(
      EventsStream.readEvents(spark, sf0001)
        .withColumn("ts", expr("timestamp_micros(unix_micros(ts) div 1000)")), "audit_bad")
    val qb = EventsStream.hourlyAgg(collapsed)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("audit_bad_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qb.awaitTermination()
    val bad = EventsStream.auditOf(qb, "audit_bad")
    assert(bad.inputRows == truth.getLong(0), "collapse is invisible to row counts")
    assert(bad.maxTsMicros - bad.minTsMicros <
        (truth.getLong(2) - truth.getLong(1)) / 100,
      "collapsed span should be ~1000x smaller")
    assert(bad.minTsMicros != truth.getLong(1) || bad.maxTsMicros != truth.getLong(2))
  }

  test("sessionizedBatch assigns increasing session ids per user on gap") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 10L), (2L, "2024-01-01 00:05:00", 10L),
      (3L, "2024-01-01 02:00:00", 10L), (4L, "2024-01-01 00:00:00", 20L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = EventsStream.sessionizedBatch(df, 30).orderBy("event_id").collect()
    assert(r.map(_.getAs[Long]("session_seq")).toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("flatMapGroupsWithState running totals == batch groupBy") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.runningUserStats(EventsStream.readEvents(spark, sf0001)), "running_out",
      org.apache.spark.sql.streaming.OutputMode.Update())
    val batch = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(100d) + lit(0.5d)).cast("long")).cast("double") / lit(100d))
          .as("total_value"))
    // Update mode with AvailableNow emits the final state per user; the
    // cents-LONG state makes totals arrival-order-exact, so both the
    // counts AND the money totals must equal the batch aggregate
    val joined = streamed.join(batch, "user_id")
    assert(streamed.count() == batch.count())
    assert(joined.filter(streamed("n_events") =!= batch("n_events") ||
      streamed("total_value") =!= batch("total_value")).count() == 0)
  }

  test("dropDuplicatesWithinWatermark removes re-delivered events") {
    // simulate at-least-once delivery: the same source unioned with itself
    val once = EventsStream.readEvents(spark, sf0001)
    val redelivered = once.union(EventsStream.readEvents(spark, sf0001))
    val deduped = EventsStream.runToMemory(spark,
      EventsStream.dedupWithinWatermark(redelivered, Seq("event_id")), "dedup_out")
    val batch = Tables.events(spark, sf0001)
    assert(deduped.count() == batch.select("event_id").distinct().count())
  }

  test("stream-stream interval join matches the batch range join") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.purchaseViewJoin(EventsStream.readEvents(spark, sf0001)), "pv_out")
    val e = Tables.events(spark, sf0001)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"), col("ts").as("view_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("value"))
    val batch = purchases.join(views,
      col("vu") === col("user_id") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"))
      .select("purchase_id", "view_id", "user_id", "purchase_ts", "view_ts", "value")
    // AvailableNow drains everything and no event precedes the final
    // watermark by construction — the streaming append output must equal
    // the batch join exactly
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.selectExpr("purchase_id", "view_id").exceptAll(
      batch.selectExpr("purchase_id", "view_id")).isEmpty)
  }

  test("left-outer stream-stream join: inner rows exact, null rows only when provable") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.purchaseViewJoinOuter(EventsStream.readEvents(spark, sf0001)), "pvo_out")
    val e = Tables.events(spark, sf0001)
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vu"), col("ts").as("view_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val batchInner = purchases.join(views,
      col("vu") === col("user_id") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("view_ts") <= col("purchase_ts"))
      .select("purchase_id", "view_id")
    // matched portion == the batch inner join, exactly
    val streamedMatched = streamed.filter(col("view_id").isNotNull)
      .select("purchase_id", "view_id")
    assert(streamedMatched.exceptAll(batchInner).isEmpty &&
      batchInner.exceptAll(streamedMatched).isEmpty)
    // null rows: a subset of the batch anti-join (never a false unmatched),
    // and every null-row purchase is old enough that the final watermark
    // could prove it unmatched
    val batchUnmatched = purchases.join(batchInner.select("purchase_id").distinct(),
      Seq("purchase_id"), "left_anti").select("purchase_id")
    val streamedNull = streamed.filter(col("view_id").isNull).select("purchase_id")
    assert(streamedNull.exceptAll(batchUnmatched).isEmpty,
      "streaming emitted a null row for a purchase that HAS a match")
    assert(streamedNull.count() > 0, "no provably-unmatched purchases emitted at all")
  }

  test("stateful aggregation is provider-agnostic: RocksDB == default HDFS store") {
    // RocksDB is the state backend a 100 TB deployment actually runs
    // (state ≫ executor heap); the transforms must not depend on the
    // provider. Run the same watermarked agg under both and compare.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    val viaDefault = EventsStream.runToMemory(spark,
      EventsStream.hourlyAgg(EventsStream.readEvents(spark, sf0001)), "prov_default",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .collect().toSet
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val viaRocks = EventsStream.runToMemory(spark,
        EventsStream.hourlyAgg(EventsStream.readEvents(spark, sf0001)), "prov_rocks",
        org.apache.spark.sql.streaming.OutputMode.Complete())
        .collect().toSet
      assert(viaRocks == viaDefault && viaRocks.nonEmpty)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    }
  }

  test("foreachBatch parquet sink lands every event exactly once") {
    val out = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val q = EventsStream.foreachBatchParquet(
        EventsStream.readEvents(spark, sf0001).select("event_id", "event_type", "value"),
        out)
      .start()
    q.awaitTermination()
    val written = spark.read.parquet(out)
    val batch = Tables.events(spark, sf0001)
    assert(written.count() == batch.count())
    assert(written.select("event_id").distinct().count() == batch.count())
  }

  test("streaming session windows aggregate per user") {
    val sessions = EventsStream.runToMemory(spark,
      EventsStream.sessionAgg(EventsStream.readEvents(spark, sf0001), 30), "session_out")
    assert(sessions.count() > 0)
    val cols = sessions.columns.toSet
    assert(cols == Set("session_start", "session_end", "user_id", "n_events", "total_value"))
  }

  // --- state-store observability: state size must track WINDOWS/KEYS,
  // never events (the unbounded-state regression class) ---

  test("session-window state law: emitted + resident == total sessions (q12 shape)") {
    val (emitted, st) = EventsStream.runToMemoryAudited(spark,
      EventsStream.sessionAgg(EventsStream.readEvents(spark, sf0001), 30),
      "session_state_out")
    assert(st.nonEmpty, "session aggregation reported no state operator")
    val resident = st.map(_.rowsTotal).sum
    // batch truth: total (session_window, user) groups; append mode emits
    // the watermark-expired ones and keeps exactly the rest resident
    val total = Tables.events(spark, sf0001)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().count()
    assert(emitted.count() + resident == total,
      s"emitted ${emitted.count()} + resident $resident != $total sessions — " +
        s"state is not tracking sessions: $st")
    assert(st.forall(o => o.rowsTotal == 0 || o.memoryBytes > 0))
  }

  test("flatMapGroupsWithState state law: resident rows == distinct users (q13 shape)") {
    val (out, st) = EventsStream.runToMemoryAudited(spark,
      EventsStream.runningUserStats(EventsStream.readEvents(spark, sf0001)),
      "userstats_state_out",
      org.apache.spark.sql.streaming.OutputMode.Update())
    assert(st.nonEmpty, "flatMapGroupsWithState reported no state operator")
    val users = Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(st.map(_.rowsTotal).sum == users,
      s"state rows ${st.map(_.rowsTotal).sum} != $users distinct users: $st")
    assert(out.select("user_id").distinct().count() == users)
    assert(st.forall(_.memoryBytes > 0))
  }

  test("stream-stream join state law: resident rows bounded by joined inputs (q17 shape)") {
    val (out, st) = EventsStream.runToMemoryAudited(spark,
      EventsStream.purchaseViewJoin(EventsStream.readEvents(spark, sf0001)),
      "pv_state_out")
    assert(out.count() > 0)
    assert(st.nonEmpty, "stream-stream join reported no state operator")
    val resident = st.map(_.rowsTotal).sum
    val e = Tables.events(spark, sf0001)
    val inputs = e.filter(col("event_type") === "view").count() +
      e.filter(col("event_type") === "purchase").count()
    // watermark eviction keeps join state a (strict, in practice) subset
    // of the two filtered inputs; state tracking ALL events would break
    // this bound immediately
    assert(resident > 0 && resident <= inputs,
      s"join state $resident outside (0, $inputs]: $st")
    assert(st.forall(o => o.rowsTotal == 0 || o.memoryBytes > 0))
  }
}
