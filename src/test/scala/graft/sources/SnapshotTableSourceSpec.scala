package graft.sources

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SnapshotTableSourceSpec extends SparkSpec {

  private def fresh(name: String): String =
    s"/tmp/graft_io/tablesrc/${java.util.UUID.randomUUID()}/$name"

  private def drain(table: String, out: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = options.foldLeft(
      spark.readStream.format("graft-snapshot").option("path", table)) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def sunk(out: String) =
    spark.read.schema("k BIGINT, v BIGINT").parquet(out)

  test("bootstrap then tail: the first batch is the FULL snapshot at " +
      "stream start, later batches are exactly the appended rows, a " +
      "drained head no-ops, and a restart keeps the original start") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    Snapshots.commit((1L to 20L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((21L to 30L).map(k => (k, k)).toDF("k", "v"), t)
    drain(t, out, ckpt)
    assert(sunk(out).count() == 30,
      "the bootstrap batch must carry the full two-commit snapshot")
    // appends tail incrementally — only the new rows emit
    Snapshots.commit((31L to 34L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((35L to 36L).map(k => (k, k)).toDF("k", "v"), t)
    drain(t, out, ckpt)
    assert(sunk(out).count() == 36,
      "the tail must emit exactly the appended rows, once")
    // maintenance kinds are feed-silent through the table stream too
    Snapshots.compactSmall(spark, t, smallBytes = 1L << 40)
    drain(t, out, ckpt)
    assert(sunk(out).count() == 36, "a compaction must emit nothing")
    // a drained head no-ops
    drain(t, out, ckpt)
    assert(sunk(out).count() == 36)
    assert(sunk(out).select("k").distinct().count() == 36,
      "no version may ever re-emit")
  }

  test("startingVersion: a numeric floor streams feed-only from that " +
      "version (no snapshot); 'latest' emits only post-start versions") {
    import spark.implicits._
    val t = fresh("src")
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((11L to 15L).map(k => (k, k)).toDF("k", "v"), t)
    val out2 = fresh("out2")
    drain(t, out2, fresh("ckpt2"), Map("startingVersion" -> "2"))
    assert(sunk(out2).count() == 5,
      "startingVersion=2 must emit v2's rows only — no snapshot")
    val outL = fresh("outL")
    val ckptL = fresh("ckptL")
    drain(t, outL, ckptL, Map("startingVersion" -> "latest"))
    assert(!Option(new java.io.File(outL).listFiles())
        .exists(_.exists(_.getName.endsWith(".parquet"))),
      "'latest' must emit nothing at stream start")
    Snapshots.commit(Seq((100L, 100L)).toDF("k", "v"), t)
    drain(t, outL, ckptL, Map("startingVersion" -> "latest"))
    assert(sunk(outL).count() == 1,
      "'latest' must tail exactly the post-start append")
  }

  test("startingTimestamp on the table stream: feed-only after the " +
      "instant (no snapshot), equal to its version twin, mutually " +
      "exclusive with startingVersion") {
    import spark.implicits._
    val t = fresh("src")
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), t)
    Thread.sleep(40)
    val mid = System.currentTimeMillis()
    Thread.sleep(40)
    Snapshots.commit((11L to 15L).map(k => (k, k)).toDF("k", "v"), t)
    val outT = fresh("outT")
    drain(t, outT, fresh("ckptT"), Map("startingTimestamp" -> mid.toString))
    assert(sunk(outT).count() == 5,
      "the instant must floor at v1 — feed-only, no snapshot")
    val outV = fresh("outV")
    drain(t, outV, fresh("ckptV"), Map("startingVersion" -> "2"))
    assert(sunk(outT).exceptAll(sunk(outV)).isEmpty &&
        sunk(outV).exceptAll(sunk(outT)).isEmpty,
      "a timestamp floor must equal its version twin bit-for-bit")
    val e = intercept[Exception](drain(t, fresh("outX"), fresh("ckptX"),
      Map("startingVersion" -> "2", "startingTimestamp" -> mid.toString)))
    assert(e.getMessage.contains("at most one") ||
      Option(e.getCause).exists(_.getMessage.contains("at most one")))
  }

  test("a conflicting startingVersion against an existing checkpoint " +
      "refuses loudly; compatible restarts proceed") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    Snapshots.commit((1L to 8L).map(k => (k, k)).toDF("k", "v"), t)
    drain(t, out, ckpt) // snapshot mode persists
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, out, ckpt, Map("startingVersion" -> "3"))
    }
    assert(e.getMessage.contains("conflicts") ||
      Option(e.getCause).exists(_.getMessage.contains("conflicts")),
      s"got: ${e.getMessage}")
    drain(t, out, ckpt) // option-less restart keeps the persisted start
    assert(sunk(out).count() == 8)
  }

  test("non-append commits refuse loudly by default and drop whole " +
      "under skipChangeCommits (the Delta semantics)") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    Snapshots.commit((1L to 12L).map(k => (k, k)).toDF("k", "v"), t)
    drain(t, out, ckpt)
    assert(sunk(out).count() == 12)
    // v2: a CoW delete — a data CHANGE
    Snapshots.deleteWhere(spark, t, col("k") % 3 === 0)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, out, ckpt)
    }
    assert(e.getMessage.contains("skipChangeCommits") ||
      Option(e.getCause).exists(_.getMessage.contains("skipChangeCommits")),
      s"the refusal must name the opt-out: ${e.getMessage}")
    // opting in drops the delete version whole and resumes on appends
    // (first drain replays the failed WAL batch — the skipped delete —
    // second drain pulls the append; the V1 single-batch fallback
    // processes one batch per run)
    Snapshots.commit(Seq((100L, 100L)).toDF("k", "v"), t)
    drain(t, out, ckpt, Map("skipChangeCommits" -> "true"))
    drain(t, out, ckpt, Map("skipChangeCommits" -> "true"))
    val rows = sunk(out)
    assert(rows.count() == 13,
      "the changed version must drop whole; the later append must emit")
    assert(rows.filter(col("k") === 100L).count() == 1)
  }

  test("a bootstrap version expired by vacuum raises the typed " +
      "out-of-retention error through the stream") {
    import spark.implicits._
    val t = fresh("src")
    Snapshots.commit((1L to 6L).map(k => (k, k)).toDF("k", "v"), t)
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    drain(t, out, ckpt)
    // the source races ahead and vacuums past the stream's cursor
    Snapshots.commit((7L to 9L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((10L to 11L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, out, ckpt)
    }
    def isOOR(th: Throwable): Boolean = th != null &&
      (th.isInstanceOf[Snapshots.OutOfRetentionException] || isOOR(th.getCause))
    assert(isOOR(e), s"want typed out-of-retention, got: ${e.getMessage}")
  }

  test("maxVersionsPerTrigger bounds each micro-batch's version range " +
      "(backlog catch-up in bounded batches) without changing what is " +
      "delivered or how often") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    val opts = Map("maxVersionsPerTrigger" -> "2")
    // bootstrap at v1, THEN a 4-version backlog accumulates while the
    // stream is down
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), t)
    drain(t, out, ckpt, opts)
    assert(sunk(out).count() == 10, "batch 0 = the v1 snapshot")
    (1 until 5).foreach { i =>
      Snapshots.commit(
        (1L to 10L).map(k => (i * 10L + k, k)).toDF("k", "v"), t): Unit
    }
    // catch-up drains in bounded 2-version steps
    drain(t, out, ckpt, opts)
    assert(sunk(out).count() == 30, "each batch covers at most 2 versions")
    drain(t, out, ckpt, opts)
    assert(sunk(out).count() == 50)
    drain(t, out, ckpt, opts)
    assert(sunk(out).count() == 50, "a drained head must no-op")
    assert(sunk(out).select("k").distinct().count() == 50,
      "rate limiting must never re-emit or drop")
  }

  test("additive source evolution mid-stream normalizes to the pinned " +
      "schema; a restart picks up the evolved contract") {
    import spark.implicits._
    val t = fresh("src")
    val out = fresh("out")
    val ckpt = fresh("ckpt")
    Snapshots.commit((1L to 5L).map(k => (k, k)).toDF("k", "v"), t)
    drain(t, out, ckpt)
    // the source evolves additively and appends under the wider contract
    Snapshots.commit((6L to 8L).map(k => (k, k, k % 2))
      .toDF("k", "v", "flag"), t, allowEvolve = true)
    drain(t, out, ckpt)
    // pinned schema: the new column dropped, the rows arrived
    assert(sunk(out).count() == 8)
    // a FRESH stream sees the evolved contract (and fills NULLs for
    // pre-evolution rows)
    val out2 = fresh("out2")
    drain(t, out2, fresh("ckpt2"))
    val evolved = spark.read
      .schema("k BIGINT, v BIGINT, flag BIGINT").parquet(out2)
    assert(evolved.count() == 8)
    assert(evolved.filter(col("flag").isNull).count() == 5,
      "pre-evolution rows must fill typed NULLs")
  }
}
