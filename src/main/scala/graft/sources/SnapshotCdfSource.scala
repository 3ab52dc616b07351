package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.io.Snapshots

/** CHANGE FEED as a FIRST-CLASS STREAMING SOURCE — the Delta
  * `readStream.option("readChangeFeed", true)` shape on the snapshot
  * tier:
  *
  * {{{
  *   spark.readStream.format("graft-snapshot-cdf")
  *     .option("path", "/lake/events")
  *     .option("startingVersion", "1")   // or "latest" (default)
  *     // .option("startingTimestamp", "2026-01-01 00:00:00")
  *     //   — resolves once via versionAt: emit versions committed
  *     //     AFTER the instant (mutually exclusive with the above)
  *     .load()                            // data cols + _change_type,
  *                                        // _commit_version, _commit_props
  * }}}
  *
  * OFFSETS ARE TABLE VERSIONS: `getOffset` is one metadata-scale
  * [[Snapshots.latestVersion]] probe, each micro-batch is
  * [[Snapshots.changeFeed]] over the exact uncommitted version range
  * `(lastCommitted, latest]`, and Structured Streaming's offset log
  * makes delivery exactly-once per version range — a restarted stream
  * resumes from its checkpoint, never re-emitting a drained version
  * (the engine replays only the final in-flight batch, from the same
  * offsets). This retires the hand-rolled foreachBatch polling shape
  * (q91/q93's clock-tick trick) for consumers that want the feed
  * itself as a stream.
  *
  * THE `latest` FLOOR IS DURABLE: with no `startingVersion`, the floor
  * ("emit only versions after stream start") is resolved ONCE and
  * persisted under the stream's `metadataPath`, so a restart from the
  * checkpoint keeps the original floor instead of silently re-flooring
  * at the restart-time head (which would drop every version landed
  * while the stream was down).
  *
  * A cursor fallen behind the source's vacuum horizon raises the typed
  * [[Snapshots.OutOfRetentionException]] mid-stream — the consumer
  * re-bootstraps, exactly the batch contract.
  *
  * Cost model at 100 TB: `getOffset` per trigger is O(1) filesystem
  * probes (the hint fast path); a drained tick plans nothing else; a
  * batch with news plans one feed frame — O(changed rows), the same
  * plan the batch `changeFeed` runs, with every manifest-pruning and
  * sidecar-reference property intact.
  */
class SnapshotCdfSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot-cdf"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      SnapshotCdfSource.feedSchema(ctx.sparkSession,
        SnapshotCdfSource.pathOf(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val s = ctx.sparkSession
    val table = SnapshotCdfSource.pathOf(parameters)
    val floor = SnapshotCdfSource.durableFloor(s, table, metadataPath,
      SnapshotCdfSource.effectiveStartingVersion(s, table, parameters))
    new SnapshotCdfV1Source(s, table, floor,
      SnapshotCdfSource.maxVersionsOf(parameters))
  }
}

object SnapshotCdfSource {
  private[sources] def pathOf(parameters: Map[String, String]): String = {
    val p = parameters.get("path").orElse(parameters.get("PATH"))
    require(p.exists(_.nonEmpty),
      "graft-snapshot-cdf: the 'path' option is required")
    p.get
  }

  /** Fold `startingTimestamp` into the `startingVersion` contract both
    * sources share: the instant resolves ONCE through
    * [[Snapshots.versionAt]] (manifest claim times — the same clock
    * batch time travel reads), and the stream emits the versions
    * committed AFTER it — a version live AT the instant belongs to the
    * pre-history the consumer said it already has. An instant
    * predating the first retained commit floors at 0 (emit
    * everything); one behind the vacuum horizon raises the typed
    * out-of-retention error. The RESOLVED version is what persists in
    * the checkpoint's start/floor marker, so restarts re-resolve and
    * conflict-refuse exactly like an explicit `startingVersion`.
    */
  private[sources] def effectiveStartingVersion(s: SparkSession,
      table: String,
      parameters: Map[String, String]): Option[String] = {
    val sv = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion"))
    val st = parameters.get("startingtimestamp")
      .orElse(parameters.get("startingTimestamp"))
    require(sv.isEmpty || st.isEmpty,
      "graft-snapshot stream: at most one of startingVersion / " +
        "startingTimestamp may be set")
    st match {
      case None => sv
      case Some(raw) =>
        val ms = SnapshotDataSource.parseMillis(raw)
        val floor =
          try Snapshots.versionAt(s, table, ms)
          catch {
            case e: IllegalArgumentException
                if Option(e.getMessage).exists(_.contains("predates")) => 0
          }
        Some((floor + 1).toString)
    }
  }

  /** `maxVersionsPerTrigger` — RATE LIMITING for a stream catching up
    * on a deep backlog (the Delta `maxFilesPerTrigger` shape at
    * version granularity): each micro-batch covers at most this many
    * table versions, so a consumer resuming after a long outage folds
    * the backlog in bounded batches instead of one giant range whose
    * state/output would have to fit in a single trigger. Advisory
    * smoothing, exactness untouched: offsets stay exact version
    * ranges, delivery stays exactly-once per range.
    */
  private[sources] def maxVersionsOf(
      parameters: Map[String, String]): Option[Int] = {
    val m = parameters.get("maxversionspertrigger")
      .orElse(parameters.get("maxVersionsPerTrigger"))
      .map(_.trim.toInt)
    m.foreach(v => require(v >= 1,
      s"maxVersionsPerTrigger must be >= 1 (got $v)"))
    m
  }

  /** The stream's schema: the table's committed contract (nullable-
    * loosened, post-rename names) plus the feed's meta columns.
    */
  private[sources] def feedSchema(s: SparkSession, table: String): StructType = {
    val v = Snapshots.latestVersion(s, table)
    require(v >= 1, s"graft-snapshot-cdf: nothing committed at $table")
    val base = SnapshotDataSource.schemaAt(s, table, v)
    StructType(base.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", IntegerType),
      StructField("_commit_props", StringType)))
  }

  /** Resolve and PERSIST the exclusive floor version: versions ≤ floor
    * never emit. `startingVersion = n` floors at n−1 (emit from n);
    * absent or `latest` floors at the head AT FIRST CREATION — read
    * back from `metadataPath` on every later creation, so restarts
    * keep the original floor.
    */
  private[sources] def durableFloor(s: SparkSession, table: String,
      metadataPath: String, startingVersion: Option[String]): Int = {
    val f = new Path(metadataPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val floorFile = new Path(metadataPath, "graft-cdf-floor")
    if (f.exists(floorFile)) {
      val in = f.open(floorFile)
      val persisted =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      // a DIFFERENT explicit startingVersion against an existing
      // checkpoint refuses LOUDLY: silently keeping the persisted floor
      // would make the user misread every emitted range ("latest" and
      // absent stay compatible — they mean "whatever floor stream
      // start resolved", which IS the persisted one)
      startingVersion.map(_.trim.toLowerCase)
        .filterNot(v => v == "latest" || v.isEmpty)
        .foreach { n =>
          require(n.toInt - 1 == persisted,
            s"graft-snapshot-cdf at $table: startingVersion=$n conflicts " +
              s"with this checkpoint's persisted floor $persisted (emit " +
              s"from ${persisted + 1}) — re-flooring an existing " +
              "checkpoint would mislabel the stream's history; use a " +
              "fresh checkpointLocation to start from a different version")
        }
      persisted
    } else {
      val floor = startingVersion.map(_.trim.toLowerCase) match {
        case None | Some("latest") => Snapshots.latestVersion(s, table)
        case Some(n) =>
          val from = n.toInt
          require(from >= 1,
            s"graft-snapshot-cdf: startingVersion must be >= 1 (got $n)")
          from - 1
      }
      f.mkdirs(new Path(metadataPath))
      // temp + rename: a crash mid-write must not leave a torn floor
      // file for the restart to misparse (rename refuses an existing
      // dest — the one writer per checkpoint contract holds either way)
      val tmp = new Path(metadataPath,
        s".graft-cdf-floor.${java.util.UUID.randomUUID()}.tmp")
      val out = f.create(tmp, false)
      try out.write(floor.toString.getBytes("UTF-8")) finally out.close()
      if (!f.rename(tmp, floorFile)) {
        // LOST THE FIRST-START RACE: adopt the winner's persisted
        // floor — two racing first-starts must run with the one
        // durable truth, not each with its own resolution
        f.delete(tmp, false): Unit
        val in = f.open(floorFile)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      } else floor
    }
  }
}

final class SnapshotCdfV1Source(s: SparkSession, table: String,
    floorExclusive: Int,
    maxVersionsPerTrigger: Option[Int] = None) extends Source {

  override val schema: StructType = SnapshotCdfSource.feedSchema(s, table)

  // monotone high-water mark of offered/committed ends — getBatch
  // advances it (including the engine's restart recovery replay, which
  // re-calls getBatch with the last committed offsets), so the rate cap
  // below never offers an offset BEHIND the checkpoint
  private var seenEnd: Int = floorExclusive

  override def getOffset: Option[Offset] = {
    val latest = Snapshots.latestVersion(s, table)
    val capped = maxVersionsPerTrigger
      .fold(latest)(m => math.min(latest, seenEnd + m))
    seenEnd = math.max(seenEnd, capped)
    if (seenEnd <= floorExclusive) None else Some(LongOffset(seenEnd))
  }

  private def versionOf(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json.trim.toInt // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(floorExclusive) + 1
    val to = versionOf(end)
    seenEnd = math.max(seenEnd, to)
    import org.apache.spark.sql.functions.col
    // the engine asserts isStreaming on the returned frame — bridge the
    // planned feed query through the same internalCreateDataFrame door
    // Spark's own v1 sources use ([[DatasetShim.ofBatchAsStream]])
    org.apache.spark.sql.graft.DatasetShim.ofBatchAsStream(s,
      Snapshots.changeFeed(s, table, from, to)
        .select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def stop(): Unit = ()
}
