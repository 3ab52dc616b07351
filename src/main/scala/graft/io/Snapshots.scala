package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based snapshot isolation with time travel — the atomic-
  * publish contract Iceberg/Delta provide, reduced to its load-bearing
  * core so the engine's sinks compose into a multi-writer lakehouse
  * without any table-format dependency:
  *
  *  - every commit writes IMMUTABLE parquet under its own uniquely-
  *    named `data/c-<id>/` directory — existing files are never
  *    touched, so in-flight readers keep a consistent view for free,
  *    and a crashed attempt's orphan never collides with its retry;
  *  - a version is DEFINED by `manifest-v<N>.txt` (the data directories
  *    composing it: all prior commits plus the new one — append
  *    semantics), written to a temp name and atomically renamed, so a
  *    manifest either exists complete or not at all — a crash
  *    mid-commit leaves orphan data files (harmless, GC-able), never a
  *    torn table;
  *  - `_latest` (the current version number) is updated LAST, again by
  *    rename; readers resolve it, then read only the files its
  *    manifest names — a writer publishing v+1 concurrently is
  *    invisible until that final rename lands.
  *
  * Time travel = reading an old manifest; nothing is ever rewritten, so
  * every historical version stays exactly reproducible until a GC
  * prunes unreferenced directories. At 100 TB the manifest is a
  * file-list artifact (KBs per commit) and the data path is the
  * engine's ordinary parquet sink — commit cost is O(new files), not
  * O(table).
  *
  * Single-writer per table is assumed (the reference pipeline's shape);
  * multi-writer needs a CAS on `_latest`, which plain filesystems don't
  * give — documented, not faked.
  */
object Snapshots {

  private def fs(s: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, v: Int) =
    new Path(s"$table/manifest-v$v.txt")

  /** Atomically write `content` at `dest` via temp-file + rename.
    * `FileContext.rename(OVERWRITE)` rather than `FileSystem.rename`:
    * the latter refuses an existing destination on the local FS, and
    * `_latest` is republished on every commit.
    */
  private def atomicWrite(s: SparkSession, f: FileSystem, dest: Path,
      content: String): Unit = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(dest.toUri, s.sparkContext.hadoopConfiguration)
      .rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Current version, 0 when the table doesn't exist yet. */
  def latestVersion(s: SparkSession, table: String): Int = {
    val f = fs(s, table)
    val p = new Path(s"$table/_latest")
    if (!f.exists(p)) 0
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    }
  }

  private def manifestDirs(s: SparkSession, table: String, v: Int): Seq[String] = {
    val f = fs(s, table)
    val in = f.open(manifestPath(table, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Append-commit `df` as the table's next version; returns it. The
    * data directory name is COMMIT-unique (not version-derived), so a
    * crashed attempt's orphan never collides with the retry.
    */
  def commit(df: DataFrame, table: String): Int = {
    val s = df.sparkSession
    val prev = latestVersion(s, table)
    val v = prev + 1
    val dir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
    df.write.mode("errorifexists").parquet(s"$table/$dir")
    val dirs = (if (prev == 0) Nil else manifestDirs(s, table, prev)) :+ dir
    val f = fs(s, table)
    atomicWrite(s, f, manifestPath(table, v), dirs.mkString("\n"))
    atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
    v
  }

  /** Read a specific version (time travel), or the latest when None. */
  def read(s: SparkSession, table: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    val paths = manifestDirs(s, table, v).map(d => s"$table/$d")
    s.read.parquet(paths: _*)
  }
}
