package graft.sources

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SnapshotCdfSourceSpec extends SparkSpec {

  private def fresh(name: String): String =
    s"/tmp/graft_io/cdfsrc/${java.util.UUID.randomUUID()}/$name"

  private def drain(table: String, out: String, ckpt: String,
      startingVersion: Option[String]): Unit = {
    val reader = spark.readStream.format("graft-snapshot-cdf")
      .option("path", table)
    val q = startingVersion.fold(reader)(v => reader.option("startingVersion", v))
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("the feed streams: versions are offsets, a drained stream " +
      "no-ops, a restart resumes exactly-once from the checkpoint, and " +
      "folding the streamed feed reconstructs the head") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    Snapshots.commit((1L to 20L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    Snapshots.commit((21L to 30L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    drain(t, out, ckpt, Some("1"))
    val feed1 = spark.read.parquet(out)
    assert(feed1.count() == 30 &&
      feed1.filter(col("_change_type") === "insert").count() == 30,
      "the first drain must emit versions 1..2 as inserts")
    assert(feed1.agg(max("_commit_version")).head().getInt(0) == 2)
    // drained: a second run with the same checkpoint emits NOTHING
    drain(t, out, ckpt, Some("1"))
    assert(spark.read.parquet(out).count() == 30,
      "a drained stream must not re-emit (exactly-once per version)")
    // the source evolves: CoW delete + merge + MoR delete (merge before
    // the MoR delete — live dvs refuse merges by contract)
    Snapshots.deleteWhere(spark, t, col("k") <= 3)
    Snapshots.mergeUpsert(spark, t,
      Seq((5L, 555L), (99L, 990L)).toDF("k", "v"), "k")
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") === 30L)
    drain(t, out, ckpt, Some("1"))
    val feed2 = spark.read.parquet(out)
    // 30 inserts + 3 cow-deletes + 1 mor-delete + merge (1 pre-delete +
    // 2 inserts)
    assert(feed2.count() == 37, s"got ${feed2.count()}")
    // fold law: last event per key (insert outranks delete in-version)
    // reconstructs the head exactly
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(desc("_commit_version"),
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val folded = feed2.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("_change_type") === "insert")
      .select("k", "v")
    val head = Snapshots.read(spark, t).select("k", "v")
    assert(folded.exceptAll(head).isEmpty && head.exceptAll(folded).isEmpty,
      "folding the streamed feed must reconstruct the head")
  }

  test("the default floor is 'latest' and survives restarts: only " +
      "post-start versions emit, and a restart keeps the ORIGINAL floor") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), t)
    // floor = latest (v1): nothing to emit yet (the sink may have laid
    // down only its _spark_metadata — no part files means no rows)
    drain(t, out, ckpt, None)
    assert(!Option(new java.io.File(out).listFiles())
        .exists(_.exists(_.getName.endsWith(".parquet"))),
      "a latest-floored stream must emit nothing at start")
    Snapshots.commit((11L to 15L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((16L to 18L).map(k => (k, k)).toDF("k", "v"), t)
    // the restart must NOT re-floor at the new head (v3) — the durable
    // floor (v1) makes versions 2..3 emit
    drain(t, out, ckpt, None)
    val feed = spark.read.parquet(out)
    assert(feed.count() == 8,
      s"the durable floor must emit v2..v3 (8 rows), got ${feed.count()}")
    assert(feed.agg(min("_commit_version")).head().getInt(0) == 2)
    // a CONFLICTING explicit startingVersion against the existing
    // checkpoint refuses LOUDLY — silently keeping the persisted floor
    // would mislabel every emitted range for the re-pointing user
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-snapshot-cdf")
        .option("path", t).option("startingVersion", "3").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("conflicts") ||
      Option(e.getCause).exists(_.getMessage.contains("conflicts")),
      s"re-flooring an existing checkpoint must refuse: ${e.getMessage}")
    // a matching explicit startingVersion (floor 1 → emit from 2) and
    // "latest" both stay compatible with the persisted floor
    drain(t, out, ckpt, Some("2"))
    drain(t, out, ckpt, Some("latest"))
    assert(spark.read.parquet(out).count() == 8,
      "compatible restarts must neither refuse nor re-emit")
  }

  test("startingTimestamp: the instant resolves once through versionAt " +
      "and emits the same range as its version twin; conflicts and " +
      "double floors refuse loudly") {
    import spark.implicits._
    val t = fresh("src")
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), t)
    Thread.sleep(40)
    val mid = System.currentTimeMillis()
    Thread.sleep(40)
    Snapshots.commit((11L to 20L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((21L to 25L).map(k => (k, k)).toDF("k", "v"), t)
    def drainTs(out: String, ckpt: String,
        opts: Map[String, String]): Unit = {
      val reader = spark.readStream.format("graft-snapshot-cdf")
        .option("path", t)
      val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val outA = fresh("outA"); val ckptA = fresh("ckptA")
    drainTs(outA, ckptA, Map("startingTimestamp" -> mid.toString))
    val a = spark.read.parquet(outA)
    assert(a.count() == 15 &&
        a.agg(min("_commit_version")).head().getInt(0) == 2,
      "the timestamp floor must emit exactly the versions after it")
    // the version twin emits the identical range
    val outB = fresh("outB")
    drainTs(outB, fresh("ckptB"), Map("startingVersion" -> "2"))
    val b = spark.read.parquet(outB).select("k", "v", "_commit_version")
    val a2 = a.select("k", "v", "_commit_version")
    assert(a2.exceptAll(b).isEmpty && b.exceptAll(a2).isEmpty,
      "a timestamp floor must equal its version twin bit-for-bit")
    // restart with the SAME timestamp: compatible, nothing re-emits
    drainTs(outA, ckptA, Map("startingTimestamp" -> mid.toString))
    assert(spark.read.parquet(outA).count() == 15)
    // a CONFLICTING explicit floor against the checkpoint refuses
    val e = intercept[Exception](
      drainTs(outA, ckptA, Map("startingVersion" -> "1")))
    assert(e.getMessage.contains("conflicts") ||
      Option(e.getCause).exists(_.getMessage.contains("conflicts")))
    // both floors at once refuse up front
    val e2 = intercept[Exception](drainTs(fresh("outC"), fresh("ckptC"),
      Map("startingVersion" -> "1", "startingTimestamp" -> mid.toString)))
    assert(e2.getMessage.contains("at most one") ||
      Option(e2.getCause).exists(_.getMessage.contains("at most one")))
    // an instant predating the first commit floors at 0: everything
    val outD = fresh("outD")
    drainTs(outD, fresh("ckptD"), Map("startingTimestamp" -> "1000"))
    assert(spark.read.parquet(outD).count() == 25,
      "a pre-history instant must emit the whole retained feed")
  }

  test("maxVersionsPerTrigger on the CDF source: a backlog drains in " +
      "bounded version ranges, exactly-once") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    (0 until 5).foreach { i =>
      Snapshots.commit(
        (1L to 4L).map(k => (i * 10L + k, k)).toDF("k", "v"), t): Unit
    }
    def drainCapped(): Unit = {
      val q = spark.readStream.format("graft-snapshot-cdf")
        .option("path", t).option("startingVersion", "1")
        .option("maxVersionsPerTrigger", "2").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainCapped()
    val first = spark.read.parquet(out)
    assert(first.count() == 8 &&
        first.agg(max("_commit_version")).head().getInt(0) == 2,
      "the first capped batch must cover versions 1..2 only")
    drainCapped()
    assert(spark.read.parquet(out)
      .agg(max("_commit_version")).head().getInt(0) == 4)
    drainCapped()
    val all = spark.read.parquet(out)
    assert(all.count() == 20 &&
        all.agg(max("_commit_version")).head().getInt(0) == 5,
      "the backlog must fully drain in bounded steps")
    drainCapped()
    assert(spark.read.parquet(out).count() == 20,
      "a drained head must no-op; nothing re-emits")
  }

  test("the snapshot SINK: one CAS commit per micro-batch, CHECK " +
      "constraints bind streamed batches, writerId is mandatory, " +
      "non-Append modes refuse") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val base = s"/tmp/graft_io/cdfsrc/${java.util.UUID.randomUUID()}"
    val in = s"$base/in"
    val t = s"$base/t"
    new java.io.File(in).mkdirs()
    def stage(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = new java.io.File(s"$base/stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$in/$name.parquet").toPath): Unit
    }
    stage("a", Seq((1L, Option(10L)), (2L, Option(20L))).toDF("k", "v"))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", LongType)))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream.format("graft-snapshot")
        .option("path", t).option("writerId", "w-spec")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run(s"$base/ckpt")
    assert(Snapshots.latestVersion(spark, t) == 1 &&
      Snapshots.read(spark, t).count() == 2)
    // the table's constraint binds STREAMED batches: a violating slice
    // fails the stream naming the constraint, and nothing lands
    Snapshots.addCheck(spark, t, "v-pos", "v > 0")
    stage("b", Seq((3L, Option(-5L))).toDF("k", "v"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      run(s"$base/ckpt"))
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: causes(x.getCause)
    assert(causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("v-pos"))),
      s"expected the CHECK refusal through the sink, got $e")
    assert(Snapshots.latestVersion(spark, t) == 2, // v2 = the addCheck
      "the violating batch must not land")
    // writerId is mandatory; non-Append modes refuse
    assert(intercept[Exception] {
      spark.readStream.schema(schema).parquet(in)
        .writeStream.format("graft-snapshot").option("path", t)
        .option("checkpointLocation", s"$base/ckpt3")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }.getMessage.contains("writerId"))
    assert(intercept[Exception] {
      spark.readStream.schema(schema).parquet(in)
        .groupBy("k").count()
        .writeStream.format("graft-snapshot").option("path", t)
        .option("writerId", "w2")
        .option("checkpointLocation", s"$base/ckpt4")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }.getMessage.toLowerCase.contains("append"))
  }

  test("a floored version expired by vacuum raises the typed " +
      "out-of-retention error through the stream") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    (1L to 4L).foreach { i =>
      Snapshots.commit(Seq((i, i)).toDF("k", "v"), t): Unit
    }
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain(t, out, ckpt, Some("1")))
    def causes(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: causes(x.getCause)
    assert(causes(e).exists(_.isInstanceOf[Snapshots.OutOfRetentionException]),
      s"expected the typed retention error, got: $e")
  }
}
