package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

import graft.io.Snapshots

/** STREAMING FROM THE TABLE ITSELF — the third leg of the streaming
  * triangle (sink: q97; feed source: q96; this: the Delta
  * "streaming-from-table" contract), and the shape users reach for
  * first: "stream this table into that one" without knowing the change
  * feed exists:
  *
  * {{{
  *   spark.readStream.format("graft-snapshot")
  *     .option("path", "/lake/events")        // data columns only
  *     // .option("startingVersion", "3")     // feed-only from v3
  *     // .option("startingVersion", "latest")// feed-only from now
  *     // .option("startingTimestamp", "…")   // feed-only after the
  *     //   instant (versionAt-resolved once; excludes startingVersion)
  *     // .option("skipChangeCommits", "true")// drop non-append versions
  *     // .option("maxVersionsPerTrigger","8")// bound backlog batches
  *     .load()
  * }}}
  *
  * SEMANTICS: with no `startingVersion`, the FIRST micro-batch is the
  * full snapshot at the stream-start version (the initial-snapshot
  * bootstrap), and every later batch is the append tail — the rows new
  * versions INSERTED, read through [[Snapshots.changeFeed]] per
  * version. With `startingVersion = n`, no snapshot: the stream emits
  * inserts from version n on (`latest` floors at the head). Versions
  * are the stream's offsets (q96's machinery), so the engine's offset
  * log carries the cursor and each version range delivers exactly once.
  *
  * NON-APPEND commits (merge / MoR delete / CoW delete / restore)
  * REFUSE LOUDLY by default — an insert-only reading of an update
  * would silently corrupt the downstream copy. `skipChangeCommits =
  * true` opts into dropping those versions whole (the Delta option and
  * semantics); maintenance kinds (compact / materialize / rename /
  * constraint) move bytes, never rows, and always pass silently.
  *
  * THE START IS DURABLE: the resolved mode (`snapshot:<v>` or
  * `feed:<floor>`) persists under the stream's `metadataPath`, so a
  * restart keeps the original bootstrap point; a CONFLICTING explicit
  * `startingVersion` against an existing checkpoint refuses loudly
  * (same contract as [[SnapshotCdfSource]]'s floor). A fresh
  * checkpoint re-bootstraps at the current head — composed with the
  * exactly-once sink's `(writerId, batchId)` tags, the whole replay
  * no-ops end-to-end (the q98 gate's hard leg).
  *
  * The COLUMN CONTRACT pins at stream start: additive source evolution
  * mid-stream normalizes to the pinned schema (new columns drop until
  * a restart picks up the evolved contract; rows predating an
  * evolution fill typed NULLs) — the Structured Streaming fixed-schema
  * rule. A bootstrap or tail version expired by vacuum raises the
  * typed [[Snapshots.OutOfRetentionException]] mid-stream.
  *
  * Cost model at 100 TB: `getOffset` per trigger is O(1) probes; a
  * drained tick plans nothing; the bootstrap batch is one snapshot
  * read (O(table), once); every tail batch reads ONLY the new
  * versions' directories — O(appended rows), never a table diff.
  */
object SnapshotTableSource {

  private[sources] def dataSchema(s: SparkSession, table: String)
      : StructType = {
    val v = Snapshots.latestVersion(s, table)
    require(v >= 1, s"graft-snapshot stream: nothing committed at $table")
    SnapshotDataSource.schemaAt(s, table, v)
  }

  /** Resolve and PERSIST the stream's start: `Right(bootV)` = snapshot
    * bootstrap at bootV then tail; `Left(floor)` = feed-only, versions
    * ≤ floor never emit. Restarts read the persisted mode back; an
    * explicit `startingVersion` that implies a DIFFERENT start refuses
    * loudly (absent and `latest`-compatible options pass — trimming
    * options after the first run is the normal operational shape).
    */
  private[sources] def durableStart(s: SparkSession, table: String,
      metadataPath: String,
      startingVersion: Option[String]): Either[Int, Int] = {
    val f = new Path(metadataPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val startFile = new Path(metadataPath, "graft-table-start")
    def readPersisted(): (String, Either[Int, Int]) = {
      val in = f.open(startFile)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      txt.split(":") match {
        case Array("snapshot", v) => (txt, Right(v.toInt))
        case Array("feed", fl) => (txt, Left(fl.toInt))
        case _ => sys.error(
          s"graft-snapshot stream: unreadable start marker '$txt' at " +
            s"$metadataPath — the checkpoint is torn; rebuild it")
      }
    }
    if (f.exists(startFile)) {
      val (txt, persisted) = readPersisted()
      startingVersion.map(_.trim.toLowerCase).filter(_.nonEmpty)
        .foreach { sv =>
          val conflict = (persisted, sv) match {
            case (Left(_), "latest") => false // feed stays feed
            case (Left(fl), n) => n.toInt - 1 != fl
            case (Right(_), _) => true // explicit floor vs snapshot mode
          }
          require(!conflict,
            s"graft-snapshot stream at $table: startingVersion=$sv " +
              s"conflicts with this checkpoint's persisted start " +
              s"'$txt' — re-flooring an existing checkpoint would " +
              "mislabel the stream's history; use a fresh " +
              "checkpointLocation to start elsewhere")
        }
      persisted
    } else {
      val resolved: Either[Int, Int] =
        startingVersion.map(_.trim.toLowerCase).filter(_.nonEmpty) match {
          case None => Right(math.max(1, Snapshots.latestVersion(s, table)))
          case Some("latest") => Left(Snapshots.latestVersion(s, table))
          case Some(n) =>
            val from = n.toInt
            require(from >= 1,
              s"graft-snapshot stream: startingVersion must be >= 1 " +
                s"(got $n)")
            Left(from - 1)
        }
      val txt = resolved match {
        case Right(v) => s"snapshot:$v"
        case Left(fl) => s"feed:$fl"
      }
      f.mkdirs(new Path(metadataPath))
      val tmp = new Path(metadataPath,
        s".graft-table-start.${java.util.UUID.randomUUID()}.tmp")
      val out = f.create(tmp, false)
      try out.write(txt.getBytes("UTF-8")) finally out.close()
      if (!f.rename(tmp, startFile)) {
        // LOST THE FIRST-START RACE: adopt the WINNER's persisted start
        // — returning our own resolution would let two racing
        // first-starts run with divergent starts (snapshot:v vs
        // feed:f) while only one is durable, and a later restart would
        // then conflict with what actually ran
        f.delete(tmp, false): Unit
        readPersisted()._2
      } else resolved
    }
  }
}

final class SnapshotTableV1Source(s: SparkSession, table: String,
    start: Either[Int, Int], skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Int] = None) extends Source {

  override val schema: StructType = SnapshotTableSource.dataSchema(s, table)

  // versions ≤ base are covered by the bootstrap snapshot (Right) or
  // excluded by the feed floor (Left)
  private val base: Int = start.fold(identity, identity)

  // monotone high-water mark of offered/committed ends — getBatch
  // advances it (including the engine's restart recovery replay), so
  // the rate cap never offers an offset behind the checkpoint
  private var seenEnd: Int = base

  override def getOffset: Option[Offset] = {
    val latest = Snapshots.latestVersion(s, table)
    val capped = maxVersionsPerTrigger
      .fold(latest)(m => math.min(latest, seenEnd + m))
    start match {
      // snapshot mode: the snapshot itself is data — offer the boot
      // version even when nothing landed since
      case Right(bootV) =>
        seenEnd = math.max(seenEnd, math.max(bootV, capped))
        Some(LongOffset(seenEnd))
      case Left(floor) =>
        seenEnd = math.max(seenEnd, capped)
        if (seenEnd <= floor) None else Some(LongOffset(seenEnd))
    }
  }

  private def versionOf(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json.trim.toInt // SerializedOffset after restart
  }

  /** Fold a frame to the stream's pinned column contract: evolved
    * extra columns drop, pre-evolution rows fill typed NULLs. */
  private def normalized(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.map(f =>
      if (have(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)): _*)
  }

  private def emptyFrame(): DataFrame =
    s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      schema)

  /** The rows versions `(from..to]`-INSERTED, classified per version by
    * `#change` kind: appends emit their new rows, maintenance kinds
    * emit nothing, change kinds refuse (or drop whole under
    * `skipChangeCommits`). Each append reads only its own version's
    * feed slice — O(appended rows).
    */
  private def tailInserts(fromExclusive: Int, to: Int): DataFrame = {
    if (fromExclusive >= to) return emptyFrame()
    val appends = (fromExclusive + 1 to to).flatMap { v =>
      Snapshots.changeKindOf(s, table, v) match {
        case "append" => Some(v)
        case "compact" | "materialize" | "rename" | "constraint" => None
        case _ if skipChangeCommits => None
        case changeKind => throw new IllegalStateException(
          s"graft-snapshot stream at $table: version $v is a " +
            s"'$changeKind' commit — a data CHANGE, not an append; an " +
            "insert-only stream reading it would corrupt the " +
            "downstream copy. Stream the change feed " +
            "(format 'graft-snapshot-cdf') to consume updates/deletes, " +
            "or set skipChangeCommits=true to drop changed versions " +
            "whole (the Delta semantics)")
      }
    }
    if (appends.isEmpty) emptyFrame()
    else appends.map { v =>
      normalized(Snapshots.changeFeed(s, table, v, v)
        .filter(col("_change_type") === "insert"))
    }.reduce(_.unionByName(_))
  }

  override def getBatch(start0: Option[Offset], end: Offset): DataFrame = {
    val to = versionOf(end)
    seenEnd = math.max(seenEnd, to)
    val batch = start0 match {
      case Some(a) => tailInserts(versionOf(a), to)
      case None => start match {
        case Right(bootV) =>
          // bootstrap: the full snapshot at bootV, plus whatever landed
          // between stream start and the first trigger
          val snap =
            try normalized(Snapshots.read(s, table, Some(bootV)))
            catch {
              case _: java.io.FileNotFoundException =>
                throw new Snapshots.OutOfRetentionException(table, bootV,
                  Snapshots.earliestFeedable(s, table))
            }
          snap.unionByName(tailInserts(bootV, to))
        case Left(floor) => tailInserts(floor, to)
      }
    }
    org.apache.spark.sql.graft.DatasetShim.ofBatchAsStream(s, batch)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"SnapshotTableSource[$table, start=$start]"
}
