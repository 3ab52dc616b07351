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
  *    semantics), and the manifest name itself is the COMMIT POINT: the
  *    full content is written to a temp file first, then CLAIMED at the
  *    version-unique name by an atomic-exclusive publish — so a
  *    manifest either exists complete or not at all, and exactly ONE
  *    writer can own any version number;
  *  - `_latest` is a monotonic HINT, updated after the claim; the
  *    authoritative current version is `max(hint, listed manifests)`
  *    ([[latestVersion]] reconciles), so a crash or a lost hint race
  *    between the claim and the hint write can delay visibility but
  *    never tear or regress the table.
  *
  * MULTI-WRITER CAS: concurrent committers race on the exclusive
  * manifest-v<N> claim — the winner owns version N, the loser observes
  * the new manifest, re-reads the chain, and retries at N+1 (bounded
  * attempts), so no committed data directory is ever dropped from the
  * chain. The exclusive-create primitive is real on both target
  * filesystems: HDFS `rename(tmp, dest)` is namenode-atomic and refuses
  * an existing destination; the local FS uses a POSIX hard link
  * (`link(2)` — atomic, `EEXIST` on conflict; plain `rename(2)` would
  * silently replace). S3-class object stores need a conditional PUT
  * (`If-None-Match`) instead — out of scope here, as rename-based
  * claims are not atomic there.
  *
  * Time travel = reading an old manifest; nothing is ever rewritten, so
  * every historical version stays exactly reproducible until a GC
  * prunes unreferenced directories. At 100 TB the manifest is a
  * file-list artifact (KBs per commit) and the data path is the
  * engine's ordinary parquet sink — commit cost is O(new files), not
  * O(table).
  */
object Snapshots {

  private def fs(s: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, v: Int) =
    new Path(s"$table/manifest-v$v.txt")

  /** Atomically write `content` at `dest` via temp-file + rename.
    * `FileContext.rename(OVERWRITE)` rather than `FileSystem.rename`:
    * the latter refuses an existing destination on the local FS, and
    * the `_latest` hint is republished on every commit.
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

  /** Atomically publish `content` at `dest` IF AND ONLY IF `dest` does
    * not exist — the CAS primitive commits race on. Full content lands
    * in a temp file first, so the claimed name is complete the instant
    * it appears. Returns false when another writer already owns `dest`.
    */
  private def publishExclusive(s: SparkSession, f: FileSystem, dest: Path,
      content: String): Boolean = {
    val tmp = new Path(dest.getParent, s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val isLocal = Option(dest.toUri.getScheme).forall(sc => sc == "file" || sc == "")
    val won =
      if (isLocal) {
        // POSIX link(2): atomic, EEXIST if dest exists. rename(2) would
        // silently REPLACE an existing dest — unusable as a claim.
        val tmpNio = java.nio.file.Paths.get(
          f.makeQualified(tmp).toUri.getPath)
        val destNio = java.nio.file.Paths.get(
          f.makeQualified(dest).toUri.getPath)
        try { java.nio.file.Files.createLink(destNio, tmpNio); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        // HDFS rename: namenode-atomic, false when dest exists
        f.rename(tmp, dest)
      }
    if (isLocal || !won) f.delete(tmp, false)
    won
  }

  /** Current version, 0 when the table doesn't exist yet — the
    * AUTHORITATIVE value: the `_latest` hint reconciled against the
    * listed manifests, so a commit whose hint write crashed or lost an
    * interleaving race is still visible.
    */
  def latestVersion(s: SparkSession, table: String): Int = {
    val f = fs(s, table)
    val hint = latestHintOnly(s, table)
    // FAST PATH — probe forward from the hint: versions are CONTIGUOUS
    // (every claim is prev+1) and vacuum only expires a prefix, so when
    // `manifest-v<hint>` exists the authoritative head is reachable by
    // existence probes alone — O(1 + commits-since-hint) namenode RPCs
    // instead of an O(history) directory listing (a 100 TB table with
    // long retention lists thousands of manifests per read otherwise)
    if (hint >= 1 && {
      manifestProbeCount.incrementAndGet()
      f.exists(manifestPath(table, hint))
    }) {
      var v = hint
      while ({
        manifestProbeCount.incrementAndGet()
        f.exists(manifestPath(table, v + 1))
      }) v += 1
      v
    } else {
      // RECOVERY PATH — no hint (write crashed / never landed), or a
      // stale hint below a vacuumed cutoff: the listing is authoritative
      manifestListFallbacks.incrementAndGet()
      val listed =
        if (!f.exists(new Path(table))) 0
        else f.globStatus(new Path(s"$table/manifest-v*.txt")) match {
          case null => 0
          case sts => sts.map(_.getPath.getName
            .stripPrefix("manifest-v").stripSuffix(".txt").toInt)
            .foldLeft(0)(math.max)
        }
      math.max(hint, listed)
    }
  }

  /** Diagnostics for the [[latestVersion]] cost contract: existence
    * probes issued (fast path) and full manifest listings taken
    * (recovery path) — spec-gated so the O(1)-probe posture can't
    * silently regress to O(history) listings.
    */
  private[io] val manifestProbeCount =
    new java.util.concurrent.atomic.AtomicLong
  private[io] val manifestListFallbacks =
    new java.util.concurrent.atomic.AtomicLong

  private def manifestLines(s: SparkSession, table: String, v: Int): Seq[String] = {
    val f = fs(s, table)
    val in = f.open(manifestPath(table, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def manifestDirs(s: SparkSession, table: String, v: Int): Seq[String] =
    manifestLines(s, table, v).filterNot(_.startsWith("#"))

  /** URL-encode for manifest line safety: values ride space-delimited
    * text lines, so spaces/newlines/controls must not appear raw.
    */
  private def enc(v: String): String =
    java.net.URLEncoder.encode(v, "UTF-8")

  private def dec(v: String): String =
    java.net.URLDecoder.decode(v, "UTF-8")

  /** String bounds truncate to this many chars before riding the
    * manifest — the Iceberg write.metadata truncation convention: keys
    * can be KBs (URLs, paths), and only a prefix is needed to prune.
    */
  private val StrStatsTrunc = 16

  /** A `#dirstatsS` manifest line for a string column's [min, max] —
    * PRINTABLE-ASCII VALUES ONLY (doc ids, URLs, paths): for ASCII,
    * Java's per-char order, Spark's UTF8String byte order, and DuckDB's
    * binary collation all agree, so a prune decision is provably
    * conservative on every engine. Non-ASCII bounds record nothing (the
    * dir always reads — advisory, never lossy). The lower bound
    * truncates to a prefix (a prefix sorts ≤ the original — still a
    * lower bound); the upper bound truncates and INCREMENTS its last
    * incrementable char (a plain prefix would sort below the values it
    * must bound).
    */
  private def strStatsLine(dir: String, c: String, mn: String,
      mx: String): Option[String] = {
    val ascii = (mn + mx).forall(ch => ch >= ' ' && ch < 127.toChar)
    if (!ascii || mn.isEmpty || mx.isEmpty) None
    else truncUpperAscii(mx, StrStatsTrunc).map { up =>
      val lo = if (mn.length <= StrStatsTrunc) mn
        else mn.substring(0, StrStatsTrunc)
      s"#dirstatsS $dir $c ${enc(lo)} ${enc(up)}"
    }
  }

  private def truncUpperAscii(v: String, n: Int): Option[String] =
    if (v.length <= n) Some(v)
    else {
      val p = v.substring(0, n).toCharArray
      var i = p.length - 1
      while (i >= 0 && p(i) >= '~') i -= 1 // '~' = max printable ASCII
      if (i < 0) None
      else { p(i) = (p(i) + 1).toChar; Some(new String(p, 0, i + 1)) }
    }

  /** Unsigned UTF-8 byte order — EXACTLY the order Spark's min/max
    * computed the committed bounds in (UTF8String binary comparison),
    * so a prune decision against arbitrary query bounds can never be
    * optimistic. Java's String.compareTo (UTF-16 code units) diverges
    * above the BMP.
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** The ORDER-PRESERVING long encoding a `#dirstats` line records for
    * a column's values — type-driven, so min/max of the encoding equal
    * the encoding of min/max:
    *  - integral (long/int/short/byte): the value itself;
    *  - TIMESTAMP: epoch MICROseconds (`unix_micros` — Spark's own
    *    physical precision, exact round-trip);
    *  - DATE: epoch days (`unix_date`);
    *  - DECIMAL(p ≤ 18, s): the UNSCALED value (value × 10^s, integral
    *    by construction, fits a long for p ≤ 18).
    * Anything else refuses LOUDLY at commit: a silent lossy cast (a
    * double truncating, a float rounding) could understate a
    * directory's max and let pruning skip a directory that holds
    * matches — wrongness, not just waste. Readers decode with the same
    * type-driven table ([[SnapshotDataSource]]'s pushdown translation
    * and the manifest-aggregate fast path), so one encoding drives
    * commit, pruning, and metadata answers.
    */
  private[graft] def statsLongEncoding(c: String,
      dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{col, lit, unix_date, unix_micros}
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        col(c).cast("long")
      case TimestampType => unix_micros(col(c))
      case DateType => unix_date(col(c)).cast("long") // unix_date is INT
      case d: DecimalType if d.precision <= 18 =>
        // value × 10^s is integral at the column's scale; decimal
        // arithmetic is exact and the cast never truncates
        (col(c) * lit(BigDecimal(10).pow(d.scale))).cast("long")
      case other => throw new IllegalArgumentException(
        s"#dirstats on '$c': ${other.simpleString} has no exact " +
          "order-preserving long encoding (supported: integral, " +
          "timestamp, date, decimal(p<=18)) — a lossy encoding could " +
          "prune directories that hold matches")
    }
  }

  /** Row count of a just-written data directory from parquet FOOTERS
    * only — driver-side, O(files) metadata reads, NO Spark job (each
    * footer already records its blocks' row counts). Rides the
    * manifest as `#dirrows <dir> <n>`, the line behind the
    * metadata-only `count(*)` fast path: appends carry it forward,
    * and every REWRITE (CoW delete, merge, compaction, materialize,
    * deepen, Z-order) records a fresh line for its new directory — so
    * the shortcut stays answerable across the table's whole lifecycle;
    * a dir without a line (pre-tracking history) just degrades the
    * aggregate to a scan, never to a wrong answer.
    */
  private def footerRowCount(f: FileSystem, dirPath: Path): Long = {
    val it = f.listFiles(dirPath, true)
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") &&
          !name.startsWith(".") && !name.startsWith("_")) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(
            st, f.getConf))
        try n += r.getRecordCount finally r.close()
      }
    }
    n
  }

  /** `#dirrows` lines for freshly-written DATA dirs (rewrites,
    * merges, compactions — every op that creates a directory), so the
    * metadata-only `count(*)` stays answerable across the table's
    * whole lifecycle, not just on append-only chains. Newline-
    * terminated, ready to splice into a manifest header.
    */
  private def dirRowsLines(f: FileSystem, table: String,
      dirs: Seq[String]): String =
    dirs.map(d =>
      s"#dirrows $d ${footerRowCount(f, new Path(s"$table/$d"))}\n").mkString

  /** `#dirrows <dir> <n>` lines at `version` — dir → exact row count
    * of the files the append wrote there. */
  private[graft] def dirRowsOf(lines: Seq[String]): Map[String, Long] =
    lines.filter(_.startsWith("#dirrows "))
      .map(_.stripPrefix("#dirrows ").split(" ")).collect {
        case Array(d, n) => d -> n.toLong
      }.toMap

  /** Everything the metadata-only AGGREGATE fast path needs from one
    * manifest read: the data dirs, their `#dirrows` counts, the
    * long-encoded `#dirstats` bounds, and whether deletion vectors are
    * live (tombstones hide rows the manifest lines still count — the
    * shortcut must refuse). The decoded column domain comes from
    * [[statsLongDecode]] so min/max answers carry the column's own
    * type.
    */
  final case class ManifestAggView(dirs: Seq[String],
      dirRows: Map[String, Long],
      longStats: Map[(String, String), (Long, Long)],
      nonNull: Map[(String, String), Long], dvLive: Boolean)

  private[graft] def manifestAggView(s: SparkSession, table: String,
      version: Int): ManifestAggView = {
    val lines = manifestLines(s, table, version)
    val statArrs = lines.filter(_.startsWith("#dirstats "))
      .map(_.stripPrefix("#dirstats ").split(" "))
    ManifestAggView(
      lines.filterNot(_.startsWith("#")),
      dirRowsOf(lines),
      statArrs.collect {
        case arr if arr.length == 4 || arr.length == 5 =>
          (arr(0), arr(1)) -> ((arr(2).toLong, arr(3).toLong))
      }.toMap,
      // the r16 fifth token: per-dir NON-NULL count (absent on legacy
      // 4-token lines — consumers then refuse to reason about nulls)
      statArrs.collect {
        case arr if arr.length == 5 =>
          (arr(0), arr(1)) -> arr(4).toLong
      }.toMap,
      dvLinesOf(lines).nonEmpty)
  }

  /** Decode an encoded stats long into the column's own external type
    * — shared by [[readForScan]]'s residuals and the DSv2 metadata
    * aggregate answers. */
  private[graft] def decodeStatsLong(
      dt: org.apache.spark.sql.types.DataType, v: Long): Any =
    statsLongDecode(dt, v)

  /** The directory subset that PROVABLY contains every row of
    * `ORDER BY col <dir> <nulls> LIMIT n` — the TopN pushdown's
    * pruning decision, from one manifest read: directories ordered by
    * their relevant `#dirstats` bound are included until the rows
    * provably inside the next boundary cover n, with nulls reasoned
    * about exactly via the 5-token non-null counts (`#dirrows` minus
    * non-null = the dir's nulls). On a range-clustered or Z-ordered
    * layout the head of a 100 TB table is one directory.
    *
    * None = the manifest cannot PROVE a subset — live deletion vectors
    * (tombstones could under-fill the prefix), a dir missing its row
    * count, or a rows>0 dir missing the column's stats/non-null count
    * (could be all-null OR just untracked — indistinguishable, refuse)
    * — and the caller reads everything. Refusal degrades to a scan,
    * never to a wrong answer.
    *
    * TIE SEMANTICS (single-column): with DUPLICATE keys at the
    * boundary, the pruned read returns a VALID top-n set (every
    * included row ≤ the boundary, every excluded row ≥ it), but which
    * of the TIED rows surface can differ from a full-scan run — the
    * same nondeterminism as any ORDER BY without a total tiebreaker;
    * the sort-key values themselves are deterministic.
    *
    * `strict = true` (the MULTI-COLUMN ordering case — the caller
    * prunes on the LEADING column only): coverage counts only rows
    * provably STRICTLY inside the next boundary, and the nulls-first
    * shortcut keeps EVERY null-bearing dir. Both close the tie hole:
    * n rows strictly better on the leading key beat every excluded
    * row regardless of how later sort columns break leading-key ties,
    * whereas inclusive coverage could cut a boundary-tied row whose
    * secondary key wins.
    */
  private[graft] def topNDirs(s: SparkSession, table: String, version: Int,
      colName: String, asc: Boolean, nullsFirst: Boolean,
      n: Int, strict: Boolean = false): Option[Seq[String]] = {
    val view = manifestAggView(s, table, version)
    if (view.dvLive) return None
    val known = view.dirs.forall { d =>
      view.dirRows.get(d) match {
        case None => false
        case Some(0L) => true
        case Some(_) => view.longStats.contains((d, colName)) &&
          view.nonNull.contains((d, colName))
      }
    }
    if (!known) return None
    val live = view.dirs.filter(d => view.dirRows(d) > 0L)
    def nonNullOf(d: String) = view.nonNull((d, colName))
    def nullsOf(d: String) = view.dirRows(d) - nonNullOf(d)
    val totalNulls = live.map(nullsOf).sum
    // smallest prefix (in sort order of the dirs' bounds) whose rows
    // PROVABLY inside the next dir's boundary cover `need` non-null rows
    def valuePrefix(need: Long): Seq[String] = {
      if (need <= 0L) return Nil
      val sorted = live.filter(nonNullOf(_) > 0L).sortBy { d =>
        val (mn, mx) = view.longStats((d, colName))
        if (asc) mn else -mx
      }
      val included = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < sorted.length) {
        included += sorted(i)
        val covered =
          if (i + 1 >= sorted.length) included.map(nonNullOf).sum
          else {
            val (nmn, nmx) = view.longStats((sorted(i + 1), colName))
            val b = if (asc) nmn else nmx
            included.map { d =>
              val (mn, mx) = view.longStats((d, colName))
              val inside =
                if (strict) { if (asc) mx < b else mn > b }
                else { if (asc) mx <= b else mn >= b }
              if (inside) nonNullOf(d) else 0L
            }.sum
          }
        if (covered >= need) return included.toSeq
        i += 1
      }
      included.toSeq
    }
    Some(
      if (nullsFirst) {
        if (totalNulls >= n) {
          // the whole answer is nulls — cover n by null counts alone
          // (single-column only: all nulls TIE on the leading key, so
          // a multi-column ordering needs every null-bearing dir — a
          // later sort column could rank an excluded dir's null row
          // ahead of an included one's)
          if (strict) live.filter(nullsOf(_) > 0L)
          else {
            var acc = 0L
            val keep = scala.collection.mutable.ListBuffer[String]()
            val it = live.filter(nullsOf(_) > 0L).iterator
            while (it.hasNext && acc < n) {
              val d = it.next(); keep += d; acc += nullsOf(d)
            }
            keep.toSeq
          }
        } else
          // every null leads the answer; values fill the remainder
          (live.filter(nullsOf(_) > 0L) ++
            valuePrefix(n - totalNulls)).distinct
      } else {
        val totalVals = live.map(nonNullOf).sum
        if (totalVals >= n) valuePrefix(n.toLong)
        else live // trailing nulls needed — no provable subset, read all
      })
  }

  /** Inverse of [[statsLongEncoding]] for RESIDUAL FILTERS: decode an
    * encoded long back into a plain Scala literal of the column's own
    * type, so the residual stays a bare-column-vs-literal comparison
    * (constant-foldable → parquet footer `PushedFilters` keep working;
    * a function-wrapped column would block row-group skipping).
    * Integral columns pass the long through (Spark widens the column
    * side implicitly — the committed behavior).
    */
  private def statsLongDecode(
      dt: org.apache.spark.sql.types.DataType, v: Long): Any = {
    import org.apache.spark.sql.types._
    dt match {
      case TimestampType => java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(Math.floorDiv(v, 1000000L),
          Math.floorMod(v, 1000000L) * 1000L))
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v))
      case d: DecimalType => new java.math.BigDecimal(
        java.math.BigInteger.valueOf(v), d.scale)
      case _ => v
    }
  }

  /** Hive's reserved directory name for a NULL (or empty-string)
    * partition value — a literal data value equal to it would read back
    * as NULL, so [[commitPartitioned]] refuses it up front.
    */
  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Partition-path TYPE INFERENCE must be off while a partitioned root
    * resolves: inference types a numeric-looking STRING partition value
    * ("01", "1.10", "1e3") as int/double first, and the later cast back
    * to the committed string contract yields "1"/"1.1" — silent
    * corruption. With inference off the path value stays a string and
    * the contract cast is exact (string → verbatim, numeric → parse of
    * the canonical rendering the writer produced). The conf is session-
    * global and file-source resolution reads it eagerly, so the toggle
    * holds a JVM-wide lock for just the (metadata-scale) relation
    * resolution and always restores.
    */
  private val PartInferKey =
    "spark.sql.sources.partitionColumnTypeInference.enabled"
  private val partInferLock = new Object

  /** Per-dir partition specs: `#spec <dir> <col[,col…]>` manifest lines
    * (dir → partition columns). A dir WITHOUT a spec line is flat.
    */
  private def specLinesOf(lines: Seq[String]): Map[String, Seq[String]] =
    lines.filter(_.startsWith("#spec "))
      .map(_.stripPrefix("#spec ").split(" ")).collect {
        case Array(d, cols) => d -> cols.split(",").toSeq
      }.toMap

  /** Resolve a manifest dir token to a filesystem path: ordinary tokens
    * are table-relative (`data/c-…`); an ABSOLUTE token (leading `/`)
    * is an EXTERNAL reference into another table's storage — the
    * zero-copy mechanism behind [[cloneShallow]]. Read paths resolve
    * both transparently; copy-on-write rewrites refuse externals (see
    * [[requireNoExternal]]) because their file-level hit mapping is
    * anchored on table-relative dir tokens.
    */
  private def resolveDirPath(table: String, d: String): String =
    if (d.startsWith("/")) d else s"$table/$d"

  /** Guard for ops whose hit-discovery maps `input_file_name()` back to
    * dir tokens via substring matching — sound only for table-relative
    * tokens. External (shallow-clone) references must fold local first.
    */
  private def requireNoExternal(lines: Seq[String], table: String,
      op: String): Unit = {
    val ext = lines.filterNot(_.startsWith("#")).filter(_.startsWith("/"))
    require(ext.isEmpty,
      s"$op at $table: the manifest references ${ext.size} external " +
        "(shallow-clone) directories — file-level hit mapping cannot " +
        "span them; deepenClone (or compactSmall) first")
  }

  /** Raw spec-aware read of `dirs`: directories GROUP by their partition
    * spec and each group reads as one multi-path scan — Hive partition
    * discovery materializes the partition columns for partitioned
    * groups, flat groups read as before — then the groups union by
    * name. This is what lets a table EVOLVE its partition spec without
    * rewriting history: old flat (or old-spec) dirs and new-spec dirs
    * coexist in one version, and a filter on the partition column
    * reaches the new-spec scan branch as a PartitionFilter (whole
    * directories skipped) while old dirs fall back to row filtering.
    * Partition values round-trip through path encoding, so discovered
    * types are re-cast to the COMMITTED `#schema` contract (path
    * inference would read a numeric-looking string back as int).
    * With one spec group this degenerates to exactly the old single
    * scan — no plan change for unevolved tables.
    *
    * `withFile` projects `input_file_name()` as `__f` INSIDE each group
    * (the expression must bind directly over a scan, and per-branch
    * projection keeps that true under the union).
    */
  private def readDirsRaw(s: SparkSession, table: String, lines: Seq[String],
      dirs: Seq[String], withFile: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    require(dirs.nonEmpty, s"readDirsRaw: no directories at $table")
    val specs = specLinesOf(lines)
    val contract = lines.find(_.startsWith("#schema "))
      .map(d => org.apache.spark.sql.types.StructType
        .fromDDL(d.stripPrefix("#schema ")))
    val groups = dirs.groupBy(d => specs.getOrElse(d, Nil)).toSeq
      .sortBy(_._1.mkString(","))
    val frames = groups.flatMap { case (partCols, ds) =>
      // flat dirs share ONE multi-path scan; partitioned dirs read one
      // scan per ROOT (Hive discovery refuses multiple roots —
      // CONFLICTING_DIRECTORY_STRUCTURES — and basePath can't name two
      // bases). [[compactSmall]] is what bounds the per-root union
      // width: rewrites normalize to flat, so the partitioned tail is
      // only the dirs since the last maintenance pass.
      val roots =
        if (partCols.isEmpty) Seq(ds)
        else ds.map(Seq(_))
      roots.map { rs =>
        val paths = rs.map(d => resolveDirPath(table, d))
        // an EMPTY-frame commit writes a directory with zero parquet
        // files; schema inference over such a root throws — the
        // committed #schema line IS the contract, so read under it
        // (an empty scan with the right types, additive-evolution
        // compatible: missing columns in older files surface as NULL)
        def resolve() =
          try s.read.option("mergeSchema", "true").parquet(paths: _*)
          catch {
            case e: org.apache.spark.sql.AnalysisException
                if contract.isDefined &&
                  e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
              s.read.schema(contract.get).parquet(paths: _*)
          }
        val base =
          if (partCols.isEmpty) resolve()
          else partInferLock.synchronized {
            // see [[PartInferKey]]: path values must resolve as STRINGS
            // so the contract cast below is exact, not inference→cast
            val saved = s.conf.get(PartInferKey, "true")
            s.conf.set(PartInferKey, "false")
            try resolve() finally s.conf.set(PartInferKey, saved)
          }
        val cast = partCols.foldLeft(base) { (df, c) =>
          contract.flatMap(_.fields.find(_.name == c)) match {
            case Some(f) if df.columns.contains(c) =>
              df.withColumn(c, col(c).cast(f.dataType))
            case _ => df
          }
        }
        if (withFile) cast.withColumn("__f", input_file_name()) else cast
      }
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Append-commit `df` as the table's next version; returns the version
    * this writer WON. The data directory name is COMMIT-unique (not
    * version-derived), so a crashed attempt's orphan never collides with
    * the retry — and under multi-writer contention the directory is
    * written once while only the cheap manifest claim retries.
    */
  def commit(df: DataFrame, table: String, maxAttempts: Int = 50,
      allowEvolve: Boolean = false,
      props: Map[String, String] = Map.empty): Int =
    commitTagged(df, table, None, maxAttempts, allowEvolve, props = props)
      .getOrElse(sys.error("unreachable: untagged commit cannot be deduped"))

  /** [[commit]] plus MANIFEST COLUMN STATS: the new directory's
    * `min/max(statsCol)` ride as a `#dirstats` manifest line (computed
    * by one aggregate over just-written files — O(new data), the
    * Iceberg per-file-stats idea at dir granularity), and prior
    * versions' stats lines carry forward. [[readPruned]] then skips
    * whole directories BEFORE file listing. Integral columns only —
    * stats serialize as LONGs so the manifest text is engine- and
    * locale-stable (no float formatting).
    */
  def commitWithStats(df: DataFrame, table: String, statsCol: String,
      maxAttempts: Int = 50, allowEvolve: Boolean = false): Int =
    commitTagged(df, table, None, maxAttempts, allowEvolve, Seq(statsCol))
      .getOrElse(sys.error("unreachable: untagged commit cannot be deduped"))

  /** [[commitWithStats]] over N DECLARED COLUMNS — real tables prune on
    * several (tenant AND day, key AND price band). One `#dirstats` line
    * per column rides the manifest, all N min/max pairs computed by ONE
    * aggregate over the just-written files (still O(new data) — the
    * column count multiplies the aggregate width, not the scan count).
    * Composes with [[graft.ops.Layout.clusterByZ]]: a Z-clustered write
    * gives every directory a tight hyper-rectangle in the clustered
    * dims, so an N-predicate [[readPrunedMulti]] provably opens a
    * subset of directories (the io24 gate).
    */
  def commitWithMultiStats(df: DataFrame, table: String,
      statsCols: Seq[String], maxAttempts: Int = 50,
      allowEvolve: Boolean = false): Int = {
    require(statsCols.nonEmpty, "commitWithMultiStats: no stats columns")
    commitTagged(df, table, None, maxAttempts, allowEvolve, statsCols)
      .getOrElse(sys.error("unreachable: untagged commit cannot be deduped"))
  }

  /** [[commitWithStats]] for a STRING key column (`doc_id`, URL, path —
    * the identifiers a training-data lake is actually looked up by):
    * the new directory's min/max ride a `#dirstatsS` line with
    * TRUNCATED bounds (the Iceberg convention — see [[strStatsLine]]
    * for the ASCII contract and upper-bound increment), and
    * [[readPrunedString]] skips whole directories before file listing.
    * Composable with the integral flavors: `intStatsCols` rides the
    * same single O(new data) aggregate, so one commit can prune on
    * (tenant BIGINT, doc_id STRING) together via [[readPrunedMulti]] +
    * [[readPrunedString]].
    */
  def commitWithStringStats(df: DataFrame, table: String,
      strStatsCol: String, intStatsCols: Seq[String] = Nil,
      maxAttempts: Int = 50, allowEvolve: Boolean = false): Int =
    commitTagged(df, table, None, maxAttempts, allowEvolve,
      intStatsCols, Seq(strStatsCol))
      .getOrElse(sys.error("unreachable: untagged commit cannot be deduped"))

  /** [[commit]] plus a per-directory MEMBERSHIP sketch: a Bloom filter
    * over `bloomCol` of exactly the written files rides as a
    * `data/bloom-*` sidecar file referenced by a `#dirbloom` manifest
    * line (the Iceberg puffin-blob idea at directory granularity).
    * This is the point-lookup complement to [[commitWithStats]]:
    * min/max bounds prune RANGE-clustered keys, but a scattered key
    * (hashed ids, UUIDs, content fingerprints — the identifiers a
    * training-data lake actually joins on) spans every directory's
    * range and min/max admits everything; the Bloom answers "is key X
    * possibly HERE" per directory at O(sketch bytes), so
    * [[readPrunedBloom]] opens only the directories whose sketch
    * admits the key (false-positive rate `fpp`, never a false
    * negative — advisory and exact, like every stats flavor here).
    * Sketch lifecycle: appends carry the lines, rewrites drop them
    * with their directory, vacuum pins sidecars referenced by retained
    * manifests, clones re-key both tokens into the source's path.
    */
  def commitWithBloom(df: DataFrame, table: String, bloomCol: String,
      fpp: Double = 0.001, maxAttempts: Int = 50,
      allowEvolve: Boolean = false): Int =
    commitTagged(df, table, None, maxAttempts, allowEvolve,
      bloomCols = Seq(bloomCol), bloomFpp = fpp)
      .getOrElse(sys.error("unreachable: untagged commit cannot be deduped"))

  /** POINT LOOKUP with Bloom-sketch data skipping: consult each
    * directory's `#dirbloom` sidecar for `value` (driver-side,
    * O(directories × sketch bytes), no executor work) and scan only
    * the admitting directories; directories without a sketch for
    * `colName` always read (advisory, never lossy). The residual
    * filter keeps the answer EXACT — a false positive costs one extra
    * directory scan, never a wrong row. The 100 TB shape: "fetch THIS
    * content-hash / user-id / fingerprint" costs one manifest read,
    * a few KB of sketches, and one directory's files.
    */
  def readPrunedBloom(s: SparkSession, table: String, colName: String,
      value: Long, version: Option[Int] = None): PrunedScan =
    readPrunedBloomImpl(s, table, colName, version,
      _.mightContainLong(value),
      org.apache.spark.sql.functions.col(colName) === value)

  /** [[readPrunedBloom]] for STRING keys — `doc_id`, URL, content
    * hash: the identifiers a document lake actually fetches by.
    * Membership tests against the UTF-8 bytes, matching what
    * `df.stat.bloomFilter` inserted for a string column at
    * [[commitWithBloom]] time.
    */
  def readPrunedBloomString(s: SparkSession, table: String,
      colName: String, value: String,
      version: Option[Int] = None): PrunedScan =
    readPrunedBloomImpl(s, table, colName, version,
      _.mightContainString(value),
      org.apache.spark.sql.functions.col(colName) === value)

  private def readPrunedBloomImpl(s: SparkSession, table: String,
      colName: String, version: Option[Int],
      admits: org.apache.spark.util.sketch.BloomFilter => Boolean,
      residual: org.apache.spark.sql.Column): PrunedScan = {
    import org.apache.spark.sql.functions.lit
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    val lines = manifestLines(s, table, v)
    val dirs = lines.filterNot(_.startsWith("#"))
    val f = fs(s, table)
    val blooms: Map[String, String] = lines
      .filter(_.startsWith("#dirbloom "))
      .map(_.split(" ")).collect {
        case Array(_, d, c, bPath) if c == colName => d -> bPath
      }.toMap
    val hit = dirs.filter { d =>
      blooms.get(d) match {
        case None => true // no sketch — must read
        case Some(bPath) =>
          admits(loadBloomSidecar(f, resolveDirPath(table, bPath)))
      }
    }
    val df =
      if (hit.isEmpty)
        read(s, table, Some(v)).filter(lit(false))
      else applyDv(s, table, dvLinesOf(lines),
        applyRenames(lines, readDirsRaw(s, table, lines, hit))
          .filter(residual))
    PrunedScan(df, dirs.size, hit.size)
  }

  /** MEMOIZED sidecar sketches: `data/bloom-*` files are IMMUTABLE
    * (UUID-named at commit, never rewritten — vacuum deletes, never
    * mutates), so a deserialized sketch is cacheable by absolute path
    * forever; the LRU bound caps the resident set (sketches are KBs —
    * 256 of them is metadata scale). A vacuumed sidecar's stale entry
    * is unreachable (no retained manifest references the path) and
    * ages out of the LRU. Point-lookup-heavy workloads — the "fetch
    * THIS key" serving path — stop paying one filesystem open per
    * directory per lookup.
    */
  private val bloomCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        String, org.apache.spark.util.sketch.BloomFilter](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
          String, org.apache.spark.util.sketch.BloomFilter]): Boolean =
        size() > 256
    })

  /** Sidecar opens actually issued (cache misses) — spec-gated so the
    * one-open-per-sidecar memoization can't silently regress.
    */
  private[io] val bloomSidecarOpens =
    new java.util.concurrent.atomic.AtomicLong

  private def loadBloomSidecar(f: FileSystem,
      absPath: String): org.apache.spark.util.sketch.BloomFilter = {
    val cached = bloomCache.get(absPath)
    if (cached != null) cached
    else {
      // racing loaders may both open (idempotent — same immutable bytes)
      bloomSidecarOpens.incrementAndGet()
      val in = f.open(new Path(absPath))
      val b =
        try org.apache.spark.util.sketch.BloomFilter.readFrom(in)
        finally in.close()
      bloomCache.put(absPath, b)
      b
    }
  }

  /** PARTITION EVOLUTION — commit under a (possibly NEW) partition
    * spec: the directory writes Hive-partitioned on `partCols` and a
    * `#spec <dir> <cols>` manifest line records the layout PER
    * DIRECTORY, so a table can change how it partitions without
    * rewriting a byte of history (the Iceberg partition-spec-evolution
    * move). One [[read]] spans flat, old-spec, and new-spec
    * directories ([[readDirsRaw]] groups by spec and unions by name),
    * and a filter on the partition column prunes whole directories on
    * every new-spec scan branch while old dirs fall back to row
    * filtering — new data gets the new layout's speed immediately,
    * old data keeps working, and a later [[compactSmall]] migrates it
    * incrementally (rewrites normalize to flat with the partition
    * column as data).
    */
  def commitPartitioned(df: DataFrame, table: String,
      partCols: Seq[String], maxAttempts: Int = 50,
      allowEvolve: Boolean = false,
      props: Map[String, String] = Map.empty): Int = {
    require(partCols.nonEmpty, "commitPartitioned: no partition columns")
    commitTagged(df, table, None, maxAttempts, allowEvolve,
      props = props, partitionCols = partCols)
      .getOrElse(sys.error("unreachable: untagged commit cannot be deduped"))
  }

  /** A manifest-stats-pruned range read: `df` is the EXACT answer (the
    * residual filter proves what the stats admitted), `dirsRead` of
    * `dirsTotal` directories were opened.
    */
  final case class PrunedScan(df: DataFrame, dirsTotal: Int, dirsRead: Int)

  /** Range read with MANIFEST-LEVEL data skipping: directories whose
    * committed `#dirstats [min, max]` cannot intersect `[lo, hi]` are
    * skipped before any file listing; directories WITHOUT stats always
    * read (pruning is advisory, never lossy); the residual filter runs
    * regardless, so the answer equals the full-scan filter bit-for-bit.
    * The planning cost is one manifest read — KB-scale at 100 TB.
    */
  def readPruned(s: SparkSession, table: String, colName: String,
      lo: Long, hi: Long, version: Option[Int] = None): PrunedScan = {
    import org.apache.spark.sql.functions.{col, lit}
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    val lines = manifestLines(s, table, v)
    val dirs = lines.filterNot(_.startsWith("#"))
    val stats = lines.filter(_.startsWith("#dirstats "))
      .map(_.stripPrefix("#dirstats ").split(" ")) .collect {
        case arr if arr.length == 4 || arr.length == 5 =>
          (arr(0), arr(1)) -> ((arr(2).toLong, arr(3).toLong))
      }.toMap
    val hit = dirs.filter { d =>
      stats.get((d, colName)).forall { case (mn, mx) => mx >= lo && mn <= hi }
    }
    val residual = col(colName) >= lo && col(colName) <= hi
    val df =
      if (hit.isEmpty)
        read(s, table, Some(v)).filter(lit(false)) // schema-only, no rows
      else applyDv(s, table, dvLinesOf(lines),
        applyRenames(lines, readDirsRaw(s, table, lines, hit))
          .filter(residual))
    PrunedScan(df, dirs.size, hit.size)
  }

  /** STRING-KEY range read with manifest-level data skipping — the
    * [[readPruned]] shape over `#dirstatsS` bounds
    * ([[commitWithStringStats]]): a directory skips when its committed
    * truncated [min, maxUpper] cannot intersect `[lo, hi]` in UNSIGNED
    * UTF-8 byte order (the order the bounds were computed in);
    * directories without string stats always read (advisory, never
    * lossy), and the residual filter makes the answer equal the
    * full-scan filter bit-for-bit. Point lookup = `lo == hi` — the
    * "fetch THIS doc_id from 100 TB" path, pruned to the handful of
    * directories whose key range admits it for one manifest read.
    */
  def readPrunedString(s: SparkSession, table: String, colName: String,
      lo: String, hi: String, version: Option[Int] = None): PrunedScan = {
    import org.apache.spark.sql.functions.{col, lit}
    require(utf8Cmp(lo, hi) <= 0,
      s"readPrunedString: empty range ['$lo', '$hi']")
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    val lines = manifestLines(s, table, v)
    val dirs = lines.filterNot(_.startsWith("#"))
    val stats = lines.filter(_.startsWith("#dirstatsS "))
      .map(_.stripPrefix("#dirstatsS ").split(" ")).collect {
        case Array(d, c, mn, mx) => (d, c) -> ((dec(mn), dec(mx)))
      }.toMap
    val hit = dirs.filter { d =>
      stats.get((d, colName)).forall { case (mn, mx) =>
        utf8Cmp(mx, lo) >= 0 && utf8Cmp(mn, hi) <= 0
      }
    }
    val residual = col(colName) >= lo && col(colName) <= hi
    val df =
      if (hit.isEmpty)
        read(s, table, Some(v)).filter(lit(false)) // schema-only, no rows
      else applyDv(s, table, dvLinesOf(lines),
        applyRenames(lines, readDirsRaw(s, table, lines, hit))
          .filter(residual))
    PrunedScan(df, dirs.size, hit.size)
  }

  /** N-PREDICATE range read with manifest-level data skipping: a
    * directory is opened unless SOME predicate's committed stats prove
    * its range disjoint — the conjunctive-pruning rule (each predicate
    * can only shrink the read set, and any one disjoint dimension is
    * enough to skip). Directories missing a column's stats are read for
    * that predicate (advisory, never lossy), and the FULL conjunctive
    * residual filter runs regardless, so the answer equals the
    * full-scan filter bit-for-bit. Combined with a
    * [[graft.ops.Layout.clusterByZ]]-ordered write, every directory is
    * a tight hyper-rectangle in the clustered dims and a selective 2-D
    * box query provably opens a strict subset (gated in io24).
    */
  def readPrunedMulti(s: SparkSession, table: String,
      preds: Seq[(String, Long, Long)],
      version: Option[Int] = None): PrunedScan = {
    import org.apache.spark.sql.functions.{col, lit}
    require(preds.nonEmpty, "readPrunedMulti: no predicates")
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    val lines = manifestLines(s, table, v)
    val dirs = lines.filterNot(_.startsWith("#"))
    val stats = lines.filter(_.startsWith("#dirstats "))
      .map(_.stripPrefix("#dirstats ").split(" ")).collect {
        case arr if arr.length == 4 || arr.length == 5 =>
          (arr(0), arr(1)) -> ((arr(2).toLong, arr(3).toLong))
      }.toMap
    val hit = dirs.filter { d =>
      preds.forall { case (c, lo, hi) =>
        stats.get((d, c)).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }
    val residual = preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    val df =
      if (hit.isEmpty)
        read(s, table, Some(v)).filter(lit(false)) // schema-only, no rows
      else applyDv(s, table, dvLinesOf(lines),
        applyRenames(lines, readDirsRaw(s, table, lines, hit))
          .filter(residual))
    PrunedScan(df, dirs.size, hit.size)
  }

  /** One conjunct of a scan-time predicate set — the shape a DSv2
    * filter pushdown ([[graft.sources.SnapshotDataSource]]) maps onto
    * manifest pruning. Every variant is ADVISORY: it can only prove a
    * directory's committed stats/sketch DISJOINT from the predicate
    * (skip), never that a row matches — [[readForScan]] re-applies the
    * exact residual, so translation is always conservative-safe.
    */
  sealed trait ScanPred { def colName: String }
  /** Point predicate on an integral column: prunes on `#dirstats`
    * range AND `#dirbloom` membership (both consulted when present). */
  final case class EqLongPred(colName: String, value: Long) extends ScanPred
  /** Point predicate on a string column: `#dirstatsS` truncated range
    * AND string-keyed `#dirbloom` membership. */
  final case class EqStringPred(colName: String, value: String) extends ScanPred
  /** Inclusive range on an integral column (open ends = None); prunes
    * on `#dirstats`. Strict comparisons translate conservatively to
    * their inclusive bound — the residual keeps exactness. */
  final case class RangeLongPred(colName: String, lo: Option[Long],
    hi: Option[Long]) extends ScanPred
  /** Inclusive range on a string column in unsigned UTF-8 byte order;
    * prunes on `#dirstatsS`. */
  final case class RangeStringPred(colName: String, lo: Option[String],
    hi: Option[String]) extends ScanPred
  /** IN-list on an integral column: a directory skips only when EVERY
    * value is provably absent (disjunction inside the conjunct). */
  final case class InLongPred(colName: String, values: Seq[Long]) extends ScanPred
  /** IN-list on a string column. */
  final case class InStringPred(colName: String, values: Seq[String]) extends ScanPred
  /** `IS NULL`: a directory skips when its 5-token stats prove the
    * column NULL-FREE there (non-null count == the dir's `#dirrows`
    * count — both lines required; either missing reads). */
  final case class IsNullPred(colName: String) extends ScanPred
  /** `IS NOT NULL`: a directory skips when its 5-token stats prove the
    * column ALL-NULL there (non-null count == 0 — the empty-set
    * sentinel line the commit writes for an all-null dir). */
  final case class IsNotNullPred(colName: String) extends ScanPred
  /** Disjunction of translated BRANCHES (each branch a conjunction of
    * conjuncts): a directory skips only when EVERY branch is provably
    * disjoint — i.e. some conjunct of each branch rejects it. The
    * residual re-applies the exact `(b1a AND b1b) OR (b2a …)` shape. */
  final case class OrPred(branches: Seq[Seq[ScanPred]]) extends ScanPred {
    require(branches.nonEmpty && branches.forall(_.nonEmpty),
      "OrPred: every branch must carry at least one conjunct")
    def colName: String =
      branches.flatten.map(_.colName).distinct.mkString("|")
  }

  /** UNIFIED pruned read for a pushed-down predicate set — the scan
    * behind the DSv2 front door: one manifest read resolves every
    * stats flavor (`#dirstats` / `#dirstatsS` / `#dirbloom`), a
    * directory is opened unless SOME conjunct proves it disjoint
    * (conjunctive pruning — any one disjoint dimension suffices), and
    * the full residual filter applies over the dv-resolved,
    * rename-normalized read so the answer equals the full-scan filter
    * bit-for-bit. Directories missing a column's stats always read for
    * that conjunct, and stats lines recorded under a PRE-RENAME
    * physical name simply stop matching the current name — both
    * degrade to reading, never to wrongness. Applying the residual
    * INSIDE the returned frame (not only above the DSv2 boundary)
    * keeps the predicates visible to Catalyst, so they also push into
    * the parquet scans as footer-level `PushedFilters` — manifest
    * pruning skips directories, footer pruning skips row groups, and
    * the row filter guarantees exactness, one predicate set driving
    * all three tiers.
    */
  /** @param limitHint a pushed-down `LIMIT n`: the returned frame
    *        carries `LocalLimit(n)`, and — when NO predicates and NO
    *        live deletion vectors can hide rows — the scan opens only
    *        the shortest PREFIX of directories whose `#dirrows` counts
    *        already cover n (a `LIMIT 10` over a 100 TB table reads one
    *        directory, not a planned full scan). Dirs without a count
    *        contribute zero to the cover (conservative: the prefix only
    *        shortens when KNOWN rows suffice), so the pruning can under-
    *        deliver rows never.
    */
  /** @param topNHint a pushed-down `ORDER BY col [, …] LIMIT n` as
    *        `(col, ascending, nullsFirst, n, strict)` — `strict` marks
    *        a MULTI-COLUMN ordering pruned on its leading column only
    *        (see [[topNDirs]]): when no predicates are
    *        pushed, the scan opens only the [[topNDirs]] subset — the
    *        directories that provably contain every candidate top-n
    *        row (the caller re-sorts globally; partial pushdown). A
    *        manifest that cannot prove the subset degrades to reading
    *        everything.
    */
  def readForScan(s: SparkSession, table: String,
      version: Option[Int] = None,
      preds: Seq[ScanPred] = Nil,
      limitHint: Option[Int] = None,
      topNHint: Option[(String, Boolean, Boolean, Int, Boolean)] = None)
      : PrunedScan = {
    import org.apache.spark.sql.functions.{col, lit}
    // the hints are MUTUALLY EXCLUSIVE by construction (Spark pushes
    // limit XOR topN): a caller passing both would get unsorted
    // #dirrows prefix pruning plus .limit(n) — wrong for TopN
    // semantics, so refuse loudly rather than silently mis-prune
    require(limitHint.isEmpty || topNHint.isEmpty,
      "readForScan: limitHint and topNHint are mutually exclusive — a " +
        "#dirrows prefix need not contain the top-n rows")
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    val lines = manifestLines(s, table, v)
    val dirs = lines.filterNot(_.startsWith("#"))
    val hitAll = readForScanDirs(s, table, lines, preds)
    val hit = (limitHint, topNHint) match {
      case (Some(n), _) if preds.isEmpty && dvLinesOf(lines).isEmpty =>
        val rowsOf = dirRowsOf(lines)
        var acc = 0L
        val keep = scala.collection.mutable.ListBuffer[String]()
        val it = hitAll.iterator
        while (it.hasNext && acc < n) {
          val d = it.next(); keep += d; acc += rowsOf.getOrElse(d, 0L)
        }
        keep.toSeq
      case (None, Some((c, asc, nf, n, strict))) if preds.isEmpty =>
        topNDirs(s, table, v, c, asc, nf, n, strict).getOrElse(hitAll)
      case _ => hitAll
    }
    // residuals compare the bare column against a literal DECODED back
    // into the column's own type (timestamps, dates, decimals — see
    // [[statsLongDecode]]), so Catalyst still pushes them into the
    // parquet footers; a long-vs-column mismatch would fail resolution
    // on a temporal column, a function-wrapped column would block
    // row-group skipping
    def residualOver(schema: org.apache.spark.sql.types.StructType) = {
      def dec(c: String, x: Long): Any =
        statsLongDecode(schema(c).dataType, x)
      def exprsOf(ps: Seq[ScanPred]): Seq[org.apache.spark.sql.Column] =
        ps.flatMap {
          case EqLongPred(c, x) => Seq(col(c) === dec(c, x))
          case EqStringPred(c, x) => Seq(col(c) === x)
          case RangeLongPred(c, lo, hi) =>
            lo.map(x => col(c) >= dec(c, x)).toSeq ++
              hi.map(x => col(c) <= dec(c, x)).toSeq
          case RangeStringPred(c, lo, hi) =>
            lo.map(col(c) >= _).toSeq ++ hi.map(col(c) <= _).toSeq
          case InLongPred(c, vs) if vs.nonEmpty =>
            Seq(col(c).isin(vs.map(dec(c, _)): _*))
          case InStringPred(c, vs) if vs.nonEmpty => Seq(col(c).isin(vs: _*))
          // an EMPTY IN-list matches zero rows — honor the predicate's
          // semantics for direct library callers too (dropping it
          // entirely would hand back the whole unfiltered table; safe
          // behind DSv2 only because Spark re-applies its own filter
          // above the scan)
          case InLongPred(_, vs) if vs.isEmpty => Seq(lit(false))
          case InStringPred(_, vs) if vs.isEmpty => Seq(lit(false))
          case IsNullPred(c) => Seq(col(c).isNull)
          case IsNotNullPred(c) => Seq(col(c).isNotNull)
          // each branch is a conjunction; the disjunction re-applies
          // the exact (b1a AND b1b) OR (b2 …) shape
          case OrPred(branches) =>
            Seq(branches.map(b => exprsOf(b).reduceOption(_ && _)
              .getOrElse(lit(true))).reduce(_ || _))
        }
      exprsOf(preds).reduceOption(_ && _)
    }
    val df0 =
      if (hit.isEmpty) read(s, table, Some(v)).filter(lit(false))
      else {
        val base = applyDv(s, table, dvLinesOf(lines),
          applyRenames(lines, readDirsRaw(s, table, lines, hit)))
        residualOver(base.schema).map(base.filter).getOrElse(base)
      }
    val df = limitHint.map(df0.limit).getOrElse(df0)
    PrunedScan(df, dirs.size, hit.size)
  }

  /** What a NATIVE FILE-LEVEL scan of `version` needs beyond the
    * parquet files themselves: the (uniform) partition spec, the live
    * deletion vectors whose tombstone keys must suppress rows, and the
    * manifest's accumulated `#rename old new` pairs (in order) that
    * map old physical column names onto the current contract — see
    * [[nativeScanPlan]].
    */
  final case class NativeScanPlan(partCols: Seq[String],
      dvDirs: Seq[String], dvKeyCol: Option[String],
      renames: Seq[(String, String)] = Nil)

  /** The PHYSICAL column names of one data directory's parquet files —
    * one footer read (all files in a dir share their commit's schema),
    * memoized forever by absolute path (data dirs are immutable:
    * UUID-suffixed at commit, vacuum deletes, never rewrites). `Nil`
    * for an empty directory (zero files — nothing to map). This is
    * what lets a `#rename`-bearing table ride the native batch scan:
    * the per-dir physical names resolve the logical read schema
    * without opening data pages.
    */
  private[graft] def dirPhysicalColumns(s: SparkSession, table: String,
      dir: String): Seq[String] = {
    val abs = resolveDirPath(table, dir)
    val cached = dirPhysColsCache.get(abs)
    if (cached != null) cached
    else {
      val f = fs(s, table)
      val it = f.listFiles(new Path(abs), true)
      var first: Option[String] = None
      while (first.isEmpty && it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet") &&
            !name.startsWith(".") && !name.startsWith("_"))
          first = Some(st.getPath.toString)
      }
      val cols = first match {
        case None => Nil
        case Some(p) => s.read.parquet(p).schema.fieldNames.toSeq
      }
      dirPhysColsCache.put(abs, cols)
      cols
    }
  }

  private val dirPhysColsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Seq[String]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[String]]): Boolean =
        size() > 4096
    })

  /** Simulate the [[applyRenames]] fold over ONE directory's physical
    * columns: the sequential per-pair walk (oldest first, chains
    * converge) yields each physical column's CURRENT logical name;
    * the inverse is the per-dir read mapping `logical -> physical`.
    * `None` when some pair finds BOTH names present — that is the
    * row-wise `coalesce(new, old)` shape only the V1 fold can
    * express, so the table refuses the batch path (parity over
    * speed). A logical column absent from the result simply doesn't
    * exist in this dir's files (additive evolution / post-rename
    * columns): the reader NULL-fills it, and [[commit]]'s
    * renamed-away-name guard guarantees no UNRELATED physical column
    * can shadow it.
    */
  private[graft] def renameMappingFor(physCols: Seq[String],
      renames: Seq[(String, String)]): Option[Map[String, String]] = {
    var cur = physCols.map(p => (p, p)).toMap // physical -> logical
    renames.foreach { case (o, n) =>
      val hasO = cur.valuesIterator.contains(o)
      val hasN = cur.valuesIterator.contains(n)
      if (hasO && hasN) return None
      if (hasO) cur = cur.map { case (p, c) => (p, if (c == o) n else c) }
    }
    Some(cur.map(_.swap))
  }

  /** The ordered `#rename old new` pairs of `version`'s manifest. */
  private[graft] def renamePairs(s: SparkSession, table: String,
      version: Int): Seq[(String, String)] =
    renameLinesOf(manifestLines(s, table, version))

  /** Whether `version` of `table` can execute as a NATIVE FILE-LEVEL
    * scan — parquet files readable without per-row library semantics
    * the batch reader can't carry — and under which layout. `None`
    * when the manifest carries `#rename` mappings (old physical names
    * must coalesce), MIXED partition specs (flat dirs next to
    * partitioned ones, or two different specs — per-file schemas
    * diverge), or deletion vectors the reader can't fold (mixed key
    * columns, or a key that IS a partition column — its values live
    * in paths, not files); those shapes stay on the V1 bridge, which
    * reuses the library's audited fold.
    *
    * LIVE DELETION VECTORS are eligible: a single-key dv set folds
    * into the batch reader as a broadcast tombstone probe — the same
    * anti-join [[read]] plans, executed as a hash-set filter inside
    * each partition reader (the dv side is O(deleted keys) by
    * construction, the same bound that makes the V1 anti-join
    * broadcast). This is what keeps a fact table on the fast path —
    * manifest pruning, runtime filtering, vectorized reads — through
    * the tombstone-to-materialize window a real table spends most of
    * its life in, instead of demoting to read-everything V1 on the
    * first MoR delete.
    *
    * `partCols = Nil` = flat; otherwise every data dir carries the one
    * spec, and the batch scan materializes the partition columns from
    * file paths (Spark's own partition-value cast — the values prune
    * at FILE level, exactly, including at runtime). Additive evolution
    * stays eligible: a parquet reader NULL-fills requested columns a
    * file predates, the same semantics the library applies.
    */
  private[graft] def nativeScanPlan(s: SparkSession, table: String,
      version: Int): Option[NativeScanPlan] = {
    val lines = manifestLines(s, table, version)
    val dirs = lines.filterNot(_.startsWith("#"))
    val specs = specLinesOf(lines)
    val renames = renameLinesOf(lines)
    // #rename touching a partition column cannot happen going forward
    // ([[renameColumn]] refuses live partition columns) but is checked
    // anyway: partition values parse from PATHS under the old name
    val layoutOk =
      (specs.isEmpty ||
        (specs.values.map(_.mkString(",")).toSet.size == 1 &&
          dirs.forall(specs.contains)))
    if (!layoutOk) None
    else {
      val partCols = specs.values.headOption.getOrElse(Nil)
      if (renames.exists(r =>
          partCols.contains(r._1) || partCols.contains(r._2))) None
      else {
        val dvs = dvLinesOf(lines)
        if (dvs.isEmpty) Some(NativeScanPlan(partCols, Nil, None, renames))
        else {
          val keyCols = dvs.map(_._2).distinct
          if (keyCols.size == 1 && !partCols.contains(keyCols.head))
            Some(NativeScanPlan(partCols, dvs.map(_._1),
              Some(keyCols.head), renames))
          else None
        }
      }
    }
  }

  /** Back-compat dv-free/rename-free view of [[nativeScanPlan]] (the
    * pre-fold eligibility shape — some specs pin it). */
  private[graft] def nativeScanSpec(s: SparkSession, table: String,
      version: Int): Option[Seq[String]] =
    nativeScanPlan(s, table, version)
      .filter(p => p.dvDirs.isEmpty && p.renames.isEmpty).map(_.partCols)

  /** Back-compat boolean view of [[nativeScanPlan]]. */
  private[graft] def nativeScanEligible(s: SparkSession, table: String,
      version: Int): Boolean = nativeScanPlan(s, table, version).isDefined

  /** The TOMBSTONE KEY SET of `dvDirs` — the dv anti-join's build
    * side, materialized driver-side as CATALYST-internal values
    * (UTF8String for strings, Decimal, epoch longs — exactly what a
    * partition reader's `InternalRow.get` yields, so the executor
    * probe is a plain hash lookup, no per-row conversion). O(deleted
    * keys) rows read from the dv parquet — the same bound the V1
    * path's broadcast anti-join build pays. NULL tombstones drop: an
    * anti-join on key equality never matches a NULL, so a NULL-keyed
    * data row always survives.
    */
  private[graft] def dvTombstones(s: SparkSession, table: String,
      dvDirs: Seq[String], keyType: org.apache.spark.sql.types.DataType)
      : Set[Any] = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(keyType)
    s.read.parquet(dvDirs.map(d => resolveDirPath(table, d)): _*)
      .distinct().collect().iterator
      .map(_.get(0)).filter(_ != null).map(conv).toSet
  }

  /** The columns the manifest at `version` can prune a scan on —
    * anything carrying `#dirstats` / `#dirstatsS` / `#dirbloom` lines.
    * The DSv2 batch scan advertises exactly these as its runtime-
    * filterable attributes, so dynamic partition pruning only fires
    * where the manifest can actually do the work.
    */
  private[graft] def prunableColumns(s: SparkSession, table: String,
      version: Int): Seq[String] = {
    // MEMOIZED per (table, version): manifests are immutable once
    // published, and Spark calls the batch scan's filterAttributes()
    // several times during planning — same discipline (and bound) as
    // the bloom-sidecar cache, one manifest read per table version.
    val key = s"$table@$version"
    val cached = prunableColsCache.get(key)
    if (cached != null) cached
    else {
      val lines = manifestLines(s, table, version)
      val cols = lines.filter(l => l.startsWith("#dirstats ") ||
          l.startsWith("#dirstatsS ") || l.startsWith("#dirbloom "))
        .map(_.split(" ")(2)).distinct
      prunableColsCache.put(key, cols)
      cols
    }
  }

  private val prunableColsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Seq[String]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[String]]): Boolean =
        size() > 256
    })

  /** The FILE-LEVEL plan of a native scan under `preds`: the manifest
    * pruning decision ([[readForScanDirs]] — stats, strings, Blooms,
    * null counts, disjunctions, all of it) resolved down to the
    * surviving directories' parquet files as `(absolutePath, length,
    * modificationTime, fragment, dir)`, where `fragment` is the file's
    * partition subpath relative to its data dir (`grp=2/band=x`; empty
    * for flat layouts) — what the batch scan parses partition VALUES
    * from — and `dir` is the manifest directory name the file belongs
    * to (what keys the per-dir rename mapping). One manifest read +
    * one listing per surviving directory — metadata scale; the DSv2
    * batch scan turns these into bin-packed input partitions.
    *
    * @return (dirsTotal, hitDirs, files)
    */
  private[graft] def nativeScanFiles(s: SparkSession, table: String,
      version: Int, preds: Seq[ScanPred])
      : (Int, Seq[String], Seq[(String, Long, Long, String, String)]) = {
    val lines = manifestLines(s, table, version)
    val dirs = lines.filterNot(_.startsWith("#"))
    val hit = readForScanDirs(s, table, lines, preds)
    val f = fs(s, table)
    val files = hit.flatMap { d =>
      val out =
        scala.collection.mutable.ListBuffer[(String, Long, Long, String, String)]()
      val root = f.makeQualified(new Path(resolveDirPath(table, d)))
      val rootPrefix = root.toString + "/"
      val it = f.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet") &&
            !name.startsWith(".") && !name.startsWith("_")) {
          val p = st.getPath.toString
          val rel = if (p.startsWith(rootPrefix))
            p.substring(rootPrefix.length) else name
          // hidden-PATH visibility, not just hidden-file: a '.'/'_'
          // -prefixed intermediate component (`dir/_tmp/x.parquet`)
          // is invisible to Spark's InMemoryFileIndex, so the V1
          // bridge would skip it — the native scan must agree or the
          // two paths diverge on the same manifest
          val hiddenComponent = rel.split('/').dropRight(1)
            .exists(c => c.startsWith(".") || c.startsWith("_"))
          if (!hiddenComponent) {
          val fragment =
            if (rel.contains('/')) rel.substring(0, rel.lastIndexOf('/'))
            else ""
          out += ((p, st.getLen, st.getModificationTime, fragment, d))
          }
        }
      }
      out.toSeq
    }
    (dirs.size, hit, files)
  }

  /** Size estimate for a (possibly predicate-pruned) scan of `version`:
    * the summed on-disk bytes of exactly the directories the manifest
    * pruning would open — what a cost-based planner needs to decide a
    * BROADCAST against a snapshot table (without it, a V1 relation
    * defaults to "assume huge" and a small dimension table never
    * broadcasts). One `getContentSummary` RPC per surviving directory —
    * metadata scale, resolved once per relation. Parquet bytes
    * UNDERSTATE in-memory row width, so the planner's broadcast
    * threshold stays conservative in the right direction only for
    * genuinely small tables; dv/rename folds don't change the order of
    * magnitude.
    */
  def scanSizeInBytes(s: SparkSession, table: String,
      version: Option[Int] = None, preds: Seq[ScanPred] = Nil): Long = {
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    // reuse the pruning decision at zero extra cost: dirsRead of the
    // plan readForScan would build (the frame itself stays unplanned)
    val lines = manifestLines(s, table, v)
    val f = fs(s, table)
    val scan = readForScanDirs(s, table, lines, preds)
    scan.map { d =>
      try f.getContentSummary(new Path(resolveDirPath(table, d))).getLength
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum
  }

  /** The directory subset a predicate set admits — [[readForScan]]'s
    * pruning decision without building the frame.
    */
  private def readForScanDirs(s: SparkSession, table: String,
      lines: Seq[String], preds: Seq[ScanPred]): Seq[String] = {
    val dirs = lines.filterNot(_.startsWith("#"))
    if (preds.isEmpty) dirs
    else {
      val statArrs = lines.filter(_.startsWith("#dirstats "))
        .map(_.stripPrefix("#dirstats ").split(" "))
      val intStats = statArrs.collect {
        case arr if arr.length == 4 || arr.length == 5 =>
          (arr(0), arr(1)) -> ((arr(2).toLong, arr(3).toLong))
      }.toMap
      // ENCODING DISCRIMINATOR: the 5th token (r16's non-null count)
      // marks a line written under the r16 long encoding (micros /
      // days / unscaled). A legacy 4-token line on a TEMPORAL/DECIMAL
      // column may carry the OLD cast("long") values (epoch seconds,
      // truncated decimals) — pruning a micros-encoded predicate
      // against those would skip directories that hold matches, so
      // such lines are ignored for those column types (the dir just
      // reads). Column types come from the committed `#schema`
      // contract; a schema-less manifest predates the temporal
      // encoding entirely (every writer of r16-encoded lines also
      // writes `#schema`), so its 4-token lines stay trusted as the
      // old integral-only contract.
      val v5 = statArrs.collect {
        case arr if arr.length == 5 => (arr(0), arr(1))
      }.toSet
      // the 5-token non-null counts + #dirrows drive NULL-population
      // pruning (IS NULL / IS NOT NULL)
      val nonNull = statArrs.collect {
        case arr if arr.length == 5 => (arr(0), arr(1)) -> arr(4).toLong
      }.toMap
      val dirRows = dirRowsOf(lines)
      val requiresV5: String => Boolean =
        lines.find(_.startsWith("#schema ")) match {
          case Some(l) =>
            import org.apache.spark.sql.types.{DateType, DecimalType, TimestampType}
            val temporal = org.apache.spark.sql.types.StructType
              .fromDDL(l.stripPrefix("#schema ")).fields.collect {
                case f if f.dataType == TimestampType ||
                  f.dataType == DateType ||
                  f.dataType.isInstanceOf[DecimalType] => f.name
              }.toSet
            temporal
          case None => _ => false
        }
      def longStatsOf(d: String, c: String): Option[(Long, Long)] =
        intStats.get((d, c)).filter(_ => !requiresV5(c) || v5((d, c)))
      val strStats = lines.filter(_.startsWith("#dirstatsS "))
        .map(_.stripPrefix("#dirstatsS ").split(" ")).collect {
          case Array(d, c, mn, mx) => (d, c) -> ((dec(mn), dec(mx)))
        }.toMap
      val blooms = lines.filter(_.startsWith("#dirbloom "))
        .map(_.split(" ")).collect {
          case Array(_, d, c, bPath) => (d, c) -> bPath
        }.toMap
      val f = fs(s, table)
      def bloomRejects(d: String, c: String,
          probe: org.apache.spark.util.sketch.BloomFilter => Boolean): Boolean =
        blooms.get((d, c)).exists(bp =>
          !probe(loadBloomSidecar(f, resolveDirPath(table, bp))))
      def longDisjoint(d: String, c: String, x: Long): Boolean =
        longStatsOf(d, c).exists { case (mn, mx) => x < mn || x > mx } ||
          bloomRejects(d, c, _.mightContainLong(x))
      def strDisjoint(d: String, c: String, x: String): Boolean =
        strStats.get((d, c)).exists { case (mn, mx) =>
          utf8Cmp(x, mn) < 0 || utf8Cmp(x, mx) > 0 } ||
          bloomRejects(d, c, _.mightContainString(x))
      def disjoint(d: String, p: ScanPred): Boolean = p match {
        case EqLongPred(c, x) => longDisjoint(d, c, x)
        case EqStringPred(c, x) => strDisjoint(d, c, x)
        case RangeLongPred(c, lo, hi) =>
          longStatsOf(d, c).exists { case (mn, mx) =>
            lo.exists(_ > mx) || hi.exists(_ < mn) }
        case RangeStringPred(c, lo, hi) =>
          strStats.get((d, c)).exists { case (mn, mx) =>
            lo.exists(utf8Cmp(_, mx) > 0) || hi.exists(utf8Cmp(_, mn) < 0) }
        case InLongPred(c, vs) =>
          vs.nonEmpty && vs.forall(longDisjoint(d, c, _))
        case InStringPred(c, vs) =>
          vs.nonEmpty && vs.forall(strDisjoint(d, c, _))
        // null-population pruning from the 5-token non-null counts:
        // IS NULL skips a provably null-free dir, IS NOT NULL skips a
        // provably all-null one; a dir missing either line reads
        case IsNullPred(c) =>
          nonNull.get((d, c)).exists(nn => dirRows.get(d).contains(nn))
        case IsNotNullPred(c) => nonNull.get((d, c)).contains(0L)
        // a dir skips for a disjunction only when EVERY branch has
        // some conjunct that rejects it
        case OrPred(branches) =>
          branches.forall(_.exists(disjoint(d, _)))
      }
      dirs.filter(d => !preds.exists(p => disjoint(d, p)))
    }
  }

  /** Resolve a wall-clock instant to the table version LIVE at that
    * instant — the `TIMESTAMP AS OF` half of time travel: the largest
    * version whose manifest's modification time is ≤ `millis` (commit
    * time IS the manifest claim's filesystem timestamp, the Delta
    * convention — no separate clock rides the manifest). Loud when the
    * instant predates the first RETAINED commit: an expired-manifest
    * resolution would silently answer with a later version's content.
    */
  def versionAt(s: SparkSession, table: String, millis: Long): Int = {
    val f = fs(s, table)
    val latest = latestVersion(s, table)
    require(latest >= 1, s"nothing committed at $table")
    // downward from the head: the answer is the LARGEST version whose
    // claim time is ≤ the instant, so the first hit wins and the cost
    // is O(commits since the queried instant) — "as of an hour ago"
    // touches a handful of manifests, never the table's whole history
    var v = latest
    while (v >= 1) {
      try {
        if (f.getFileStatus(manifestPath(table, v))
            .getModificationTime <= millis) return v
      } catch {
        case _: java.io.FileNotFoundException =>
          // vacuumed below here — nothing older is resolvable
          throw new OutOfRetentionException(table, v,
            earliestFeedable(s, table))
      }
      v -= 1
    }
    throw new IllegalArgumentException(
      s"versionAt $table: epoch-millis $millis predates the first " +
        s"commit — nothing existed to read at that instant")
  }

  /** EXACTLY-ONCE commit for at-least-once writers (the `foreachBatch`
    * retry contract): the `(writerId, batchId)` transaction tag travels
    * INSIDE the manifest whose atomic-exclusive claim IS the commit
    * point — so the tag and the data publish in one atomic step, the
    * Delta `txn` idea on this CAS. A retry (or a concurrent duplicate
    * of the same batch) sees the tag in the retained chain — rechecked
    * after every lost claim race, which closes the check-then-claim
    * window — and returns None without committing; a crash after the
    * data write but before the claim leaves only a GC-able orphan.
    * Tags CARRY FORWARD into every later manifest (commits and
    * maintenance rewrites alike), so replay protection lasts for the
    * table's lifetime, independent of [[vacuum]] retention — a replayed
    * batch can never slip back in because the manifest that first
    * recorded it was expired.
    *
    * @return Some(version) when this call committed; None when the
    *         (writerId, batchId) transaction was already in the chain
    */
  def commitIfAbsent(df: DataFrame, table: String, writerId: String,
      batchId: Long, maxAttempts: Int = 50,
      allowEvolve: Boolean = false,
      props: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Option[Int] =
    commitTagged(df, table, Some((writerId, batchId)), maxAttempts,
      allowEvolve, statsCols = statsCols, props = props)

  /** True when `(writerId, batchId)` already committed — i.e. some
    * retained manifest carries its tag line.
    */
  def txnSeen(s: SparkSession, table: String, writerId: String,
      batchId: Long): Boolean =
    txnSeenUpTo(s, table, writerId, batchId, latestVersion(s, table))

  private def txnSeenUpTo(s: SparkSession, table: String, writerId: String,
      batchId: Long, upTo: Int): Boolean = {
    val tag = txnLine(writerId, batchId)
    (1 to upTo).exists { v =>
      try manifestLines(s, table, v).contains(tag)
      catch { case _: java.io.FileNotFoundException => false } // vacuumed
    }
  }

  private def txnLine(writerId: String, batchId: Long): String = {
    require(!writerId.contains("\n") && writerId.nonEmpty,
      s"bad writerId: '$writerId'")
    s"#txn $writerId $batchId"
  }

  /** The table's committed schema (DDL form) at version `v`, None when
    * the manifest predates schema tracking.
    */
  def schemaOf(s: SparkSession, table: String, v: Int): Option[String] =
    manifestLines(s, table, v).find(_.startsWith("#schema "))
      .map(_.stripPrefix("#schema "))

  /** SCHEMA ENFORCEMENT: a commit whose dataframe drifts from the
    * table's committed schema is refused BEFORE any data writes —
    * silent drift is how a lakehouse table rots (a re-typed column
    * poisons every downstream reader at read time, far from the
    * producer that caused it). The committed schema travels as a
    * `#schema <ddl>` manifest header, so schema and data publish in
    * the same atomic claim. `allowEvolve = true` permits ADDITIVE
    * evolution only — existing columns must keep name+type+order, new
    * nullable columns may append (the `mergeSchema` read path fills
    * them with NULL for old files); anything else is a new table, not
    * an evolution.
    */
  private def checkSchema(s: SparkSession, table: String, df: DataFrame,
      allowEvolve: Boolean): Unit =
    checkSchemaOf(s, table, df.schema, allowEvolve)

  private def checkSchemaOf(s: SparkSession, table: String,
      schema: org.apache.spark.sql.types.StructType,
      allowEvolve: Boolean): Unit = {
    val latest = latestVersion(s, table)
    if (latest < 1) return
    // a column name RENAMED AWAY can never be re-introduced: the rename
    // mapping would silently fold the new column's values into the
    // renamed one on every read
    val retired = renameLinesOf(manifestLines(s, table, latest))
      .map(_._1).toSet -- schemaOf(s, table, latest)
        .map(d => org.apache.spark.sql.types.StructType.fromDDL(d)
          .fieldNames.toSet).getOrElse(Set.empty)
    val clash = schema.fieldNames.filter(retired)
    require(clash.isEmpty,
      s"commit to $table re-introduces renamed-away column(s) " +
        s"${clash.mkString(", ")} — pick a fresh name (the rename " +
        "mapping would corrupt it)")
    schemaOf(s, table, latest).foreach { prevDdl =>
      val newDdl = schema.toDDL
      if (newDdl != prevDdl) {
        val prevFields = org.apache.spark.sql.types.StructType.fromDDL(prevDdl)
        val newFields = schema
        val additive = newFields.fields.length > prevFields.fields.length &&
          newFields.fields.take(prevFields.fields.length).toSeq
            .zip(prevFields.fields.toSeq)
            .forall { case (n, p) => n.name == p.name && n.dataType == p.dataType }
        require(allowEvolve && additive,
          s"schema drift refused at $table: committed <$prevDdl> vs " +
            s"offered <$newDdl>" + (if (additive)
              " (additive — pass allowEvolve = true to accept)" else ""))
      }
    }
  }

  /** Manifest header for a MAINTENANCE rewrite (delete / compaction):
    * every prior txn tag carries forward (the batches those tags
    * recorded are folded into the data regardless of which directory
    * now holds it — dropping a tag would reopen its batch to replay),
    * and `#dirstats` lines carry for directories still in the chain
    * (a removed directory's stats describe files the new version no
    * longer references). The COMMITTED `#schema` line carries verbatim
    * too: a rewrite moves bytes, never the contract — the parquet
    * read-back path loosens NOT NULL to nullable, and letting that
    * leak into the header would make the next producer commit refuse
    * as schema drift. `fallbackDdl` covers pre-schema-tracking tables.
    */
  private def maintenanceHeader(s: SparkSession, table: String, prev: Int,
      fallbackDdl: String, keptDirs: Set[String],
      keepDv: Boolean = true, changeKind: String): String = {
    val prevLines = manifestLines(s, table, prev)
    val txns = prevLines.filter(_.startsWith("#txn "))
    val schemaDdl = prevLines.find(_.startsWith("#schema "))
      .map(_.stripPrefix("#schema ")).getOrElse(fallbackDdl)
    // stats and partition-spec lines carry only for directories still
    // in the chain — both line kinds are `#<kind> <dir> …`-shaped, so
    // the dir is the second token either way
    val stats = prevLines.filter(l =>
        l.startsWith("#dirstats ") || l.startsWith("#dirstatsS ") ||
          l.startsWith("#dirbloom ") || l.startsWith("#dirrows ") ||
          l.startsWith("#spec "))
      .filter(l => keptDirs.contains(l.split(" ")(1)))
    // #dv lines carry UNCONDITIONALLY except under [[materializeDeletes]]
    // (keepDv = false — the ONE path allowed to drop them, because it
    // just rewrote every tombstoned row out of the data): a plain
    // rewrite may move deleted rows into a fresh directory (compaction
    // reads raw parquet), and the anti-join on read is what keeps them
    // invisible — dropping a dv line anywhere else would resurrect keys.
    // `#change`/`#cdf` lines are PER-VERSION provenance and never carry
    // — a carried change marker would make [[changeFeed]] re-emit a
    // prior version's rows at every later version.
    val dvs = if (keepDv) prevLines.filter(_.startsWith("#dv ")) else Nil
    val rens = prevLines.filter(_.startsWith("#rename "))
    // #check lines carry like the schema contract — a rewrite moves
    // already-validated rows, the constraint keeps binding future writes
    val checks = prevLines.filter(_.startsWith("#check "))
    (txns ++ (s"#schema $schemaDdl" +: stats) ++ dvs ++ rens ++ checks ++
      Seq(s"#change $changeKind")).map(_ + "\n").mkString
  }

  /** `#check <name> <urlencoded expr>` lines — the table's commit-time
    * CHECK constraints, `name → SQL boolean expression`.
    */
  private def checkLinesOf(lines: Seq[String]): Seq[(String, String)] =
    lines.filter(_.startsWith("#check "))
      .map(_.stripPrefix("#check ").split(" ")).collect {
        case Array(n, e) => (n, dec(e))
      }

  /** The live CHECK constraints at `version` (latest when None). */
  def checksOf(s: SparkSession, table: String,
      version: Option[Int] = None): Map[String, String] = {
    val v = version.getOrElse(latestVersion(s, table))
    if (v < 1) Map.empty else checkLinesOf(manifestLines(s, table, v)).toMap
  }

  /** Enforce CHECK constraints over `df` — ONE aggregate over the new
    * rows, all constraints in the same pass (O(new data), the `#schema`
    * enforcement posture extended to VALUES). SQL CHECK semantics: a
    * row violates only when the expression evaluates to FALSE — NULL
    * (unknown) passes, exactly the ANSI / Delta rule. Violations
    * refuse LOUDLY naming the constraint, before any manifest claim.
    */
  private def requireChecks(df: DataFrame,
      checks: Seq[(String, String)], table: String, op: String): Unit =
    if (checks.nonEmpty) {
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not, sum, when}
      val aggs = checks.map { case (_, e) =>
        sum(when(coalesce(not(expr(e)), lit(false)), 1L).otherwise(0L)) }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      checks.zipWithIndex.foreach { case ((n, e), i) =>
        val bad = if (r.isNullAt(i)) 0L else r.getLong(i)
        require(bad == 0L,
          s"$op at $table: CHECK constraint '$n' <$e> violated by " +
            s"$bad row(s) — refused before any manifest claim")
      }
    }

  /** ADD a commit-time CHECK constraint — a named SQL boolean
    * expression every FUTURE commit's new rows must satisfy
    * ([[commit]]*, [[mergeUpsert]], [[applyChangesCow]],
    * [[publishStaged]] all enforce it in one O(new data) aggregate
    * before their manifest claim; violations refuse loudly naming the
    * constraint). EXISTING data validates NOW, distributed, before the
    * constraint lands — a constraint the current table already
    * violates refuses here instead of poisoning the next writer (the
    * Delta `ADD CONSTRAINT` contract). The `#check` line CARRIES like
    * the schema contract: through appends, maintenance rewrites,
    * renames (which refuse while a check references the renamed
    * column), clones, and replication
    * ([[graft.streaming.ChangeFeedSync.replicateOnce]] propagates
    * constraint changes like it propagates additive schema). The
    * commit is metadata-only (`#change constraint` — the feed emits
    * nothing). Rewrites (delete/compact/materialize) skip
    * re-validation by design: they move existing, already-validated
    * rows.
    */
  def addCheck(s: SparkSession, table: String, name: String,
      exprSql: String, maxAttempts: Int = 50): Int = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
        c == '-' || c == '_' || c == '.'),
      s"addCheck: bad constraint name '$name' (letters/digits/-_. only)")
    require(exprSql.trim.nonEmpty && !exprSql.contains("\n"),
      "addCheck: the expression must be non-empty single-line SQL")
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val lines = manifestLines(s, table, prev)
      require(!checkLinesOf(lines).exists(_._1 == name),
        s"addCheck: constraint '$name' already exists at $table — " +
          "dropCheck first to replace it")
      // the expression must RESOLVE against the current contract to a
      // boolean — fail here, not at the next writer's commit
      val probe = read(s, table, Some(prev))
        .select(org.apache.spark.sql.functions.expr(exprSql).as("c"))
      require(probe.schema.head.dataType ==
          org.apache.spark.sql.types.BooleanType,
        s"addCheck: <$exprSql> resolves to " +
          s"${probe.schema.head.dataType.simpleString}, not boolean")
      // existing data validates BEFORE the constraint lands
      requireChecks(read(s, table, Some(prev)), Seq((name, exprSql)),
        table, "addCheck")
      val header = (lines.filter(l => l.startsWith("#") &&
          !l.startsWith("#change ") && !l.startsWith("#cdf") &&
          !l.startsWith("#prop ")) ++
        Seq(s"#check $name ${enc(exprSql)}", "#change constraint"))
        .map(_ + "\n").mkString
      val dirs = lines.filterNot(_.startsWith("#"))
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + dirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return v
      }
      attempt += 1
    }
    sys.error(s"addCheck on $table lost the version race $maxAttempts times")
  }

  /** DROP a CHECK constraint by name — metadata-only commit; loud when
    * the name is not live.
    */
  def dropCheck(s: SparkSession, table: String, name: String,
      maxAttempts: Int = 50): Int = {
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val lines = manifestLines(s, table, prev)
      require(checkLinesOf(lines).exists(_._1 == name),
        s"dropCheck: no constraint '$name' at $table")
      val header = (lines.filter(l => l.startsWith("#") &&
          !l.startsWith("#change ") && !l.startsWith("#cdf") &&
          !l.startsWith("#prop ") &&
          !(l.startsWith("#check ") && l.split(" ")(1) == name)) ++
        Seq("#change constraint")).map(_ + "\n").mkString
      val dirs = lines.filterNot(_.startsWith("#"))
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + dirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return v
      }
      attempt += 1
    }
    sys.error(s"dropCheck on $table lost the version race $maxAttempts times")
  }

  private def commitTagged(df: DataFrame, table: String,
      txn: Option[(String, Long)], maxAttempts: Int,
      allowEvolve: Boolean = false,
      statsCols: Seq[String] = Nil,
      strStatsCols: Seq[String] = Nil,
      props: Map[String, String] = Map.empty,
      partitionCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      bloomFpp: Double = 0.001): Option[Int] = {
    val s = df.sparkSession
    require(props.keys.forall(_.nonEmpty), "commit: empty property key")
    require(partitionCols.forall(df.columns.contains),
      s"commit: partition column(s) " +
        s"${partitionCols.filterNot(df.columns.contains).mkString(", ")} " +
        s"not in the frame (${df.columns.mkString(", ")})")
    if (txn.exists { case (w, b) => txnSeen(s, table, w, b) }) return None
    checkSchema(s, table, df, allowEvolve)
    // a STRING partition value equal to Hive's null-sentinel (or empty —
    // the path writer folds "" into the same sentinel) would read back
    // as NULL: refuse loudly before any data writes. One limit-1 job
    // over the new data, partitioned commits only. Genuine NULLs
    // round-trip correctly (null → sentinel dir → null) and are fine.
    locally {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.types.StringType
      val strParts = partitionCols.filter(c =>
        df.schema(c).dataType == StringType)
      if (strParts.nonEmpty) {
        val bad = df.filter(strParts.map(c =>
            col(c) === HiveDefaultPartition || col(c) === "")
          .reduce(_ || _)).limit(1).count()
        require(bad == 0,
          s"commit to $table: a string partition value equals " +
            s"'$HiveDefaultPartition' or '' — the partition path would " +
            "read it back as NULL; clean the value or partition on " +
            "another column")
      }
    }
    // declared stats columns must be long-ENCODABLE (see
    // [[statsLongEncoding]]) — refuse BEFORE the data write, while the
    // caller can still fix the declaration without an orphan dir
    statsCols.foreach(c => statsLongEncoding(c, df.schema(c).dataType): Unit)
    val dir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
    if (partitionCols.isEmpty)
      df.write.mode("errorifexists").parquet(s"$table/$dir")
    else
      df.write.mode("errorifexists").partitionBy(partitionCols: _*)
        .parquet(s"$table/$dir")
    // ONE aggregate over ONLY the files just written — O(new data), all
    // declared columns' min/max in the same pass; an empty or all-null
    // column records the EMPTY-SET sentinel line [0, -1] with a zero
    // non-null count (value predicates skip it exactly; IS NOT NULL
    // and TopN null reasoning know its whole population is null)
    // read-back under the frame's OWN schema, not inference: an
    // empty-frame commit writes a directory with zero parquet files,
    // and schema inference over it throws AFTER the data dir already
    // landed — the explicit schema keeps the empty-commit contract
    // (stats/sketch build over zero rows → an empty-set stats line /
    // an admit-nothing sketch, both correct)
    def readBackWritten() = s.read.schema(df.schema).parquet(s"$table/$dir")
    // CHECK constraints validate the WRITTEN BYTES, not the input plan:
    // a non-deterministic source (rand()/uuid()/a re-read of a changing
    // external location) can change between a pre-write validation pass
    // and the write itself — validating the read-back is exact by
    // construction, and it also saves re-executing the input query (one
    // aggregate over just-written files, still O(new rows), still
    // strictly BEFORE any manifest claim). A violation deletes the
    // orphan dir and refuses loudly; the claim loop re-validates only
    // if a competing committer changed the constraint set.
    var validatedChecks = {
      val v0 = latestVersion(s, table)
      if (v0 < 1) Nil else checkLinesOf(manifestLines(s, table, v0))
    }
    try requireChecks(readBackWritten(), validatedChecks, table, "commit")
    catch {
      case e: Throwable =>
        fs(s, table).delete(new Path(s"$table/$dir"), true): Unit
        throw e
    }
    val newStatsLines: Seq[String] =
      if (statsCols.isEmpty && strStatsCols.isEmpty) Nil
      else {
        import org.apache.spark.sql.functions.{col, count, min, max}
        // integral stats lines carry a FIFTH token since r16 — the
        // column's NON-NULL count in the dir (same single aggregate):
        // with `#dirrows` it bounds the dir's null count exactly, which
        // is what lets TopN pushdown reason about NULLS FIRST/LAST
        // orderings. Older 4-token lines parse fine everywhere (the
        // count is simply unknown → consumers refuse to prune on it).
        val aggs = statsCols.flatMap { c =>
          val e = statsLongEncoding(c, df.schema(c).dataType)
          Seq(min(e), max(e), count(col(c)))
        } ++
          strStatsCols.flatMap(c =>
            Seq(min(col(c).cast("string")), max(col(c).cast("string"))))
        val r = readBackWritten().agg(aggs.head, aggs.tail: _*).head()
        val ints = statsCols.zipWithIndex.map { case (c, i) =>
          if (r.isNullAt(3 * i))
            // ALL-NULL (or zero-row) dir: the INVERTED range [0, -1]
            // encodes the EMPTY value set — any value predicate is
            // provably disjoint (no non-null values exist, so skipping
            // is exact, and pre-r17 range parsers read the same
            // emptiness), and the 0 non-null count is what lets
            // IS NOT NULL prune the dir and TopN/IS NULL reason about
            // its null population exactly
            s"#dirstats $dir $c 0 -1 ${r.getLong(3 * i + 2)}"
          else s"#dirstats $dir $c ${r.getLong(3 * i)} " +
            s"${r.getLong(3 * i + 1)} ${r.getLong(3 * i + 2)}"
        }
        val off = 3 * statsCols.size
        val strs = strStatsCols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(off + 2 * i)) None
          else strStatsLine(dir, c, r.getString(off + 2 * i),
            r.getString(off + 2 * i + 1))
        }
        ints ++ strs
      }
    val f = fs(s, table)
    // the new directory's EXACT row count from parquet footers — the
    // `count(*)`-without-a-scan line ([[footerRowCount]]); driver-side
    // metadata reads, no job
    val newDirRowsLine =
      s"#dirrows $dir ${footerRowCount(f, new Path(s"$table/$dir"))}"
    // MEMBERSHIP sketches for the new directory ([[commitWithBloom]]):
    // one Bloom filter per declared column over exactly the written
    // files, serialized as a `data/bloom-*` sidecar FILE and referenced
    // by a `#dirbloom <dir> <col> <file>` line — O(new data) to build,
    // O(sketch bytes) to consult, and vacuum keeps the sidecar exactly
    // as long as a retained manifest references it
    val newBloomLines: Seq[String] = bloomCols.map { c =>
      val back = readBackWritten()
      val n = back.count()
      // Spark's stat.bloomFilter NPEs over a zero-partition frame —
      // an empty commit gets an explicit admit-nothing sketch instead
      // (correct: the dir holds no rows, so pruning it is exact)
      val bloom =
        if (n == 0) org.apache.spark.util.sketch.BloomFilter.create(1, bloomFpp)
        else back.stat.bloomFilter(c, n, bloomFpp)
      val bPath = s"data/bloom-${java.util.UUID.randomUUID().toString.take(13)}"
      val out = f.create(new Path(s"$table/$bPath"), false)
      try bloom.writeTo(out) finally out.close()
      s"#dirbloom $dir $c $bPath"
    }
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      // the duplicate scan runs AFTER reading prev and covers 1..prev:
      // claiming prev+1 atomically fails if anything newer appeared, so
      // a concurrent same-txn commit either falls inside this scan or
      // forces a lost race and a rescan — the check-then-claim window
      // is closed (scanning before prev left it open: a duplicate
      // landing between scan and prev-read escaped both)
      if (txn.exists { case (w, b) => txnSeenUpTo(s, table, w, b, prev) }) {
        f.delete(new Path(s"$table/$dir"), true): Unit // our orphan
        return None
      }
      val v = prev + 1
      val dirs = (if (prev == 0) Nil else manifestDirs(s, table, prev)) :+ dir
      // recheck drift per attempt: a competing committer may have
      // evolved the schema between our last look and this claim
      checkSchema(s, table, df, allowEvolve)
      // prior txn tags and dirs' stats carry forward verbatim (append
      // semantics). Tags accumulating in the NEWEST manifest make
      // replay protection independent of history retention — without
      // the carry, vacuuming the manifest that recorded a batch would
      // silently reopen that batch to replay (the Delta setTransaction
      // retention trap, closed by construction here).
      val prevLines =
        if (prev == 0) Nil else manifestLines(s, table, prev)
      val carriedTxn = prevLines.filter(_.startsWith("#txn "))
      val carriedStats = prevLines.filter(l =>
        l.startsWith("#dirstats ") || l.startsWith("#dirstatsS ") ||
          l.startsWith("#dirbloom ") || l.startsWith("#dirrows "))
      val carriedDv = prevLines.filter(_.startsWith("#dv "))
      // #rename lines carry for the table's lifetime: any directory in
      // the chain may still hold pre-rename physical names; #spec lines
      // carry while their directory is in the chain (append-only here)
      val carriedRen = prevLines.filter(_.startsWith("#rename "))
      val carriedSpec = prevLines.filter(_.startsWith("#spec "))
      // #check lines carry like the schema contract; a competing
      // committer may have changed the set since validation — re-run
      // the one aggregate only in that (rare) case
      val prevChecks = checkLinesOf(prevLines)
      if (prevChecks.toSet != validatedChecks.toSet) {
        try requireChecks(readBackWritten(), prevChecks, table, "commit")
        catch {
          case e: Throwable =>
            f.delete(new Path(s"$table/$dir"), true): Unit
            throw e
        }
        validatedChecks = prevChecks
      }
      val carriedCheck = prevLines.filter(_.startsWith("#check "))
      val newSpec =
        if (partitionCols.isEmpty) Nil
        else Seq(s"#spec $dir ${partitionCols.mkString(",")}")
      // #prop lines are PER-VERSION lineage (who/why/what batch), like
      // #change — they never carry forward
      val propLines = props.toSeq.sortBy(_._1)
        .map { case (k, v0) => s"#prop ${enc(k)} ${enc(v0)}" }
      val statsHeader = (carriedStats ++ newStatsLines ++
        Seq(newDirRowsLine) ++ newBloomLines ++
        carriedDv ++ carriedRen ++ carriedSpec ++ newSpec ++ carriedCheck ++
        propLines)
        .map(_ + "\n").mkString
      val header = (carriedTxn ++ txn.map { case (w, b) => txnLine(w, b) })
        .map(_ + "\n").mkString +
        s"#schema ${df.schema.toDDL}\n" + statsHeader +
        "#change append\n"
      if (publishExclusive(s, f, manifestPath(table, v),
          header + dirs.mkString("\n"))) {
        // monotonic hint bump — BEST-EFFORT: concurrent hint writers can
        // collide inside Rename.OVERWRITE's delete+rename window; the
        // claim above already committed, so a failed/lost bump costs
        // readers one manifest listing, never a torn table
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return Some(v)
      }
      attempt += 1
    }
    sys.error(s"commit to $table lost the version race $maxAttempts times")
  }

  /** Best-effort `_latest` hint read. DEFENSIVE by design: under
    * concurrent hint republishes the local ChecksumFs renames the data
    * file and its `.crc` sidecar as two steps, so a racing reader can
    * catch a torn pair (ChecksumException) — and a crashed writer can
    * leave a stale or corrupt hint. Any unreadable hint degrades to 0;
    * [[latestVersion]]'s manifest listing is the authority.
    */
  private def latestHintOnly(s: SparkSession, table: String): Int = {
    val f = fs(s, table)
    val p = new Path(s"$table/_latest")
    try {
      if (!f.exists(p)) 0
      else {
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      }
    } catch {
      case _: java.io.IOException | _: NumberFormatException => 0
    }
  }

  /** The data directories a version references — the O(new files)
    * commit-cost audit surface (io26 gates that a merge-on-read delete
    * carries every data dir by reference, rewriting none).
    */
  def dataDirsOf(s: SparkSession, table: String, version: Int): Seq[String] =
    manifestDirs(s, table, version)

  /** Read a specific version (time travel), or the latest when None.
    * `mergeSchema` unions commit schemas so rows from before an
    * additive evolution surface with NULL in the appended columns —
    * footer merging is per-referenced-file, bounded by the manifest's
    * file list, not the lake.
    */
  def read(s: SparkSession, table: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(s, table))
    require(v >= 1, s"no committed version to read at $table")
    val lines = manifestLines(s, table, v)
    val base = readDirsRaw(s, table, lines, lines.filterNot(_.startsWith("#")))
    // RENAME MAPPING first (old-named dirs fold into the current
    // contract), then MERGE-ON-READ deletes: every `#dv <dir> <keyCol>`
    // line names a deletion-vector directory of deleted keys; reads
    // apply ONE anti-join over their union. The dv side is O(deleted
    // keys) and broadcast-eligible, so the read-time cost is a
    // map-side hash probe — the merge-on-read half of the Iceberg v2 /
    // Delta DV trade (deletes O(keys), reads pay the probe) next to
    // [[deleteWhere]]'s copy-on-write half.
    applyDv(s, table, dvLinesOf(lines), applyRenames(lines, base))
  }

  /** Apply deletion-vector `(dir, keyCol)` pairs to a data frame — one
    * anti-join over the union of the dv key files. Shared by [[read]]
    * and the pruned readers (a pruned scan that skipped the dv would
    * resurrect deleted rows).
    */
  private def applyDv(s: SparkSession, table: String,
      dvs: Seq[(String, String)], base: DataFrame): DataFrame =
    if (dvs.isEmpty) base
    else {
      val keyCols = dvs.map(_._2).distinct
      require(keyCols.size == 1,
        s"mixed dv key columns at $table: $keyCols — one key per table")
      val keys = s.read.parquet(
        dvs.map(t => resolveDirPath(table, t._1)): _*).distinct()
      base.join(keys, Seq(keyCols.head), "left_anti")
    }

  private def dvLinesOf(lines: Seq[String]): Seq[(String, String)] =
    lines.filter(_.startsWith("#dv "))
      .map(_.stripPrefix("#dv ").split(" ")).collect {
        case Array(d, k) => (d, k)
      }

  private def renameLinesOf(lines: Seq[String]): Seq[(String, String)] =
    lines.filter(_.startsWith("#rename "))
      .map(_.stripPrefix("#rename ").split(" ")).collect {
        case Array(o, n) => (o, n)
      }

  /** Apply the manifest's accumulated `#rename old new` mapping to a
    * frame read from raw parquet. Directories written BEFORE a rename
    * hold the old physical column name, directories written after hold
    * the new one, and a `mergeSchema` read across both yields BOTH
    * columns (each null where the other is populated) — so the fold is
    * per rename pair, oldest first: both present → `coalesce(new, old)`
    * under the new name; only old → a plain rename; neither → no-op.
    * Sequential application makes rename CHAINS (a→b, later b→a)
    * converge correctly over arbitrarily mixed directories.
    */
  private def applyRenames(lines: Seq[String], df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col}
    renameLinesOf(lines).foldLeft(df) { case (d, (o, n)) =>
      val has = d.columns.toSet
      if (has(o) && has(n)) d.withColumn(n, coalesce(col(n), col(o))).drop(o)
      else if (has(o)) d.withColumnRenamed(o, n)
      else d
    }
  }

  /** MERGE-ON-READ DELETE — [[deleteWhere]]'s O(deleted-keys) sibling
    * (Iceberg v2 equality-deletes / Delta deletion vectors, expressed at
    * key granularity): matching rows' KEYS land in a tiny
    * deletion-vector directory and a `#dv` manifest line; NO data
    * directory is rewritten (the new manifest carries every data dir by
    * reference), and [[read]] applies the anti-join. The write cost is
    * O(matching keys) regardless of how many terabytes hold the rows —
    * the GDPR-erasure fast path when rewrite amplification is the
    * bottleneck; schedule [[deleteWhere]]/[[compactSmall]] to
    * materialize accumulated dvs when the read-side probe grows.
    * Matching is evaluated against the dv-aware LIVE view, so a second
    * delete composes (already-deleted keys don't re-enter). CAS posture
    * identical to [[deleteWhere]]: lost race ⇒ abandon orphan, recompute.
    *
    * SEMANTICS: dv keys are TOMBSTONES — they suppress the key in every
    * data directory of the version, including rows committed AFTER the
    * delete (unlike Iceberg's sequence-number-scoped equality deletes).
    * Re-admitting a key requires materializing the dv through
    * [[deleteWhere]] (which rewrites survivors and could drop the
    * then-redundant dv lines) — the right trade for the erase-this-key
    * use case the op exists for.
    *
    * @return (version, nKeysDeleted) — current version unchanged when
    *         nothing matched
    */
  def deleteWhereMoR(s: SparkSession, table: String, keyCol: String,
      pred: org.apache.spark.sql.Column, maxAttempts: Int = 50): (Int, Long) = {
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val keys = read(s, table, Some(prev)).filter(pred)
        .select(keyCol).distinct()
      val dir = s"data/dv-${java.util.UUID.randomUUID().toString.take(13)}"
      keys.coalesce(1).write.mode("errorifexists").parquet(s"$table/$dir")
      val n = s.read.parquet(s"$table/$dir").count()
      if (n == 0) {
        f.delete(new Path(s"$table/$dir"), true): Unit
        return (prev, 0L)
      }
      val prevLines = manifestLines(s, table, prev)
      // carry every header line EXCEPT per-version provenance
      // (#change/#cdf/#cdfdel/#cdfins/#prop belong to the version that
      // wrote them — "#cdf" prefix-matches all three sidecar kinds)
      val header = prevLines.filter(l => l.startsWith("#") &&
          !l.startsWith("#change ") && !l.startsWith("#cdf") &&
          !l.startsWith("#prop ")) ++
        Seq(s"#dv $dir $keyCol", "#change mor-delete")
      val dirs = prevLines.filterNot(_.startsWith("#"))
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v),
          header.map(_ + "\n").mkString + dirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, n)
      }
      f.delete(new Path(s"$table/$dir"), true): Unit
      attempt += 1
    }
    sys.error(s"deleteWhereMoR on $table lost the version race $maxAttempts times")
  }

  /** COPY-ON-WRITE DELETE — the lakehouse row-delete path (Delta/Iceberg
    * `DELETE WHERE` in copy-on-write mode): rows matching `pred` leave
    * the CURRENT version while every historical version stays intact,
    * and only the commit directories that actually CONTAIN matching
    * rows are rewritten — untouched directories carry into the new
    * manifest by reference, their files never opened for write (the
    * GDPR-erasure cost model: O(affected files), not O(table)).
    *
    * Hit discovery is ONE filter-pruned pass: `input_file_name()` maps
    * matching rows back to their commit directory, and parquet footer
    * stats + the pushed-down predicate mean non-matching files
    * contribute only footer reads. The hit list is file-count bounded
    * (metadata scale, like the vacuum listing). Survivor rows from hit
    * directories rewrite into one fresh commit-unique directory.
    *
    * Concurrency: the new manifest claims `prev + 1` with the same CAS
    * as [[commit]]; a lost race ABANDONS the rewrite (orphan, GC-able)
    * and recomputes against the new chain — so a delete never publishes
    * a manifest computed against a superseded version (write-serializable,
    * the Delta conflict rule). A delete matching nothing publishes
    * nothing and returns the current version unchanged.
    *
    * NOTE: the historical versions retaining the deleted rows is the
    * time-travel CONTRACT, not a leak-bug — a true erasure obligation
    * must be followed by [[vacuum]] with a retention window that expires
    * every manifest referencing the pre-delete directories.
    *
    * @return (version, dirsCarried, dirsRewritten) — `version` is the
    *         new version, or the current one when nothing matched
    */
  def deleteWhere(s: SparkSession, table: String,
      pred: org.apache.spark.sql.Column, maxAttempts: Int = 50): (Int, Int, Int) = {
    import org.apache.spark.sql.functions.input_file_name
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val prevAllLines = manifestLines(s, table, prev)
      requireNoExternal(prevAllLines, table, "deleteWhere")
      val dirs = prevAllLines.filterNot(_.startsWith("#"))
      // hit discovery + rewrite both run through the rename mapping:
      // `pred` speaks the CURRENT column contract, and pre-rename
      // directories hold the old physical names (input_file_name()
      // binds over the scan BEFORE the mapping projections)
      val hitFiles = applyRenames(prevAllLines,
          readDirsRaw(s, table, prevAllLines, dirs, withFile = true))
        .filter(pred).select(org.apache.spark.sql.functions.col("__f").as("f"))
        .distinct().collect().map(_.getString(0))
      val hitDirs = dirs.filter(d => hitFiles.exists(_.contains(s"/$d/"))).toSet
      if (hitDirs.isEmpty) return (prev, dirs.size, 0)
      val carried = dirs.filterNot(hitDirs)
      val hitRows = applyRenames(prevAllLines,
        readDirsRaw(s, table, prevAllLines, hitDirs.toSeq))
      val survivors = hitRows.filter(!pred)
      val dir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      survivors.write.mode("errorifexists").parquet(s"$table/$dir")
      // CHANGE-DATA-FEED sidecar: the exact complement of the survivor
      // filter (pred TRUE *or NULL* — `filter(!pred)` drops both), so
      // the sidecar is bit-for-bit what the rewrite removed, captured
      // in the same O(hit dirs) pass instead of re-derived by diffing
      // two versions later (the Delta `_change_data` trade). Rows a dv
      // tombstone already hid are excluded — they were never visible,
      // so the feed must not report their deletion.
      import org.apache.spark.sql.functions.{coalesce, lit, not}
      val deleted = applyDv(s, table, dvLinesOf(prevAllLines),
        hitRows.filter(not(coalesce(not(pred), lit(false)))))
      val cdfDir = s"data/cdf-${java.util.UUID.randomUUID().toString.take(13)}"
      deleted.write.mode("errorifexists").parquet(s"$table/$cdfDir")
      val v = prev + 1
      val header = maintenanceHeader(s, table, prev,
        survivors.schema.toDDL, carried.toSet,
        changeKind = "delete-cow") + s"#cdf $cdfDir\n" +
        dirRowsLines(f, table, Seq(dir))
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + (carried :+ dir).mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, carried.size, hitDirs.size)
      }
      // lost the race: our rewrite was computed against a superseded
      // chain — drop the orphans and redo against the new state
      f.delete(new Path(s"$table/$dir"), true): Unit
      f.delete(new Path(s"$table/$cdfDir"), true): Unit
      attempt += 1
    }
    sys.error(s"deleteWhere on $table lost the version race $maxAttempts times")
  }

  /** COPY-ON-WRITE DELETE BY KEY FRAME — [[deleteWhere]] when the
    * doomed rows are identified by a DISTRIBUTED key list (a change
    * feed's delete events, a right-to-erasure batch) rather than a
    * predicate: hit discovery is a semi-join against the key frame
    * (never a collected `isin` — the list can be millions of keys),
    * matching directories rewrite their survivors via anti-join,
    * untouched directories carry by reference, and the deleted
    * preimages land in a `#cdf` sidecar so [[changeFeed]] stays
    * O(changed rows). Unlike [[deleteWhereMoR]], no tombstone remains:
    * the keys can re-insert immediately — the property table
    * REPLICATION needs (a replayed key may be deleted and re-inserted
    * across one sync range). Keys matching nothing are a no-op (the
    * current version returns unchanged). CAS posture identical to
    * [[deleteWhere]].
    *
    * @return (version, dirsCarried, dirsRewritten)
    */
  def deleteKeysCow(s: SparkSession, table: String, keys: DataFrame,
      keyCol: String, maxAttempts: Int = 50): (Int, Int, Int) = {
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val lines = manifestLines(s, table, prev)
      requireNoExternal(lines, table, "deleteKeysCow")
      val dirs = lines.filterNot(_.startsWith("#"))
      val keysD = keys.select(keys(keyCol)).distinct()
      val hitFiles = applyRenames(lines,
          readDirsRaw(s, table, lines, dirs, withFile = true))
        .join(keysD, Seq(keyCol), "left_semi")
        .select(org.apache.spark.sql.functions.col("__f").as("f"))
        .distinct().collect().map(_.getString(0))
      val hitDirs = dirs.filter(d => hitFiles.exists(_.contains(s"/$d/"))).toSet
      if (hitDirs.isEmpty) return (prev, dirs.size, 0)
      val carried = dirs.filterNot(hitDirs)
      val hitRows = applyRenames(lines, readDirsRaw(s, table, lines, hitDirs.toSeq))
      val dir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      hitRows.join(keysD, Seq(keyCol), "left_anti")
        .write.mode("errorifexists").parquet(s"$table/$dir")
      // feed sidecar: the VISIBLE preimages (dv-hidden rows were never
      // in the feed, so their deletion must not be reported either)
      val cdfDir = s"data/cdf-${java.util.UUID.randomUUID().toString.take(13)}"
      applyDv(s, table, dvLinesOf(lines),
          hitRows.join(keysD, Seq(keyCol), "left_semi"))
        .write.mode("errorifexists").parquet(s"$table/$cdfDir")
      val ddl = schemaOf(s, table, prev).getOrElse(hitRows.schema.toDDL)
      val header = maintenanceHeader(s, table, prev, ddl, carried.toSet,
        changeKind = "delete-cow") + s"#cdf $cdfDir\n" +
        dirRowsLines(f, table, Seq(dir))
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + (carried :+ dir).mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, carried.size, hitDirs.size)
      }
      f.delete(new Path(s"$table/$dir"), true): Unit
      f.delete(new Path(s"$table/$cdfDir"), true): Unit
      attempt += 1
    }
    sys.error(s"deleteKeysCow on $table lost the version race $maxAttempts times")
  }

  /** MERGE / UPSERT as one snapshot commit — the Delta `MERGE INTO
    * target USING source ON target.key = source.key WHEN MATCHED THEN
    * UPDATE SET * WHEN NOT MATCHED THEN INSERT *` shape, copy-on-write:
    * rows whose key appears in `source` are REPLACED by the source row,
    * source rows with fresh keys append — and only the directories that
    * actually CONTAIN matching keys rewrite (hit discovery = one
    * semi-join-pruned `input_file_name` pass, the [[deleteWhere]]
    * shape); untouched directories carry by reference. Cost is
    * O(affected files + source), not O(table) — the CDC-apply /
    * dimension-upsert workhorse at 100 TB.
    *
    * CHANGE-FEED PROVENANCE: a merge changes rows in place, so the
    * version records `#change merge` with TWO sidecars — `#cdfdel`
    * names a directory holding the visible PREIMAGES of replaced rows
    * (written in the same O(hit dirs) pass), and `#cdfins` points at
    * the source directory itself (the postimages ARE the source rows —
    * no second copy). [[changeFeed]] emits delete(preimage) +
    * insert(postimage), so the fold law `read(v) = read(v−1) − deletes
    * + inserts` holds exactly and unchanged survivor rows never leak
    * into the feed.
    *
    * Guard rails: the source must be KEY-UNIQUE (two source rows for
    * one key is an ambiguous merge — the Delta error, raised loudly
    * here); live deletion vectors refuse (a dv tombstone would
    * silently hide a just-upserted key — [[materializeDeletes]]
    * first); schema must match the committed contract exactly (merge
    * never evolves). CAS posture identical to [[deleteWhere]]: a lost
    * race abandons the rewrite and recomputes against the new chain.
    *
    * @return (version, nUpdated, nInserted) — nUpdated counts MATCHED
    *         KEYS (a target holding duplicate rows for a key still
    *         counts it once), nInserted the fresh source keys
    */
  def mergeUpsert(s: SparkSession, table: String, source: DataFrame,
      keyCol: String, maxAttempts: Int = 50,
      props: Map[String, String] = Map.empty): (Int, Long, Long) = {
    require(props.keys.forall(_.nonEmpty), "mergeUpsert: empty property key")
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val lines = manifestLines(s, table, prev)
      require(dvLinesOf(lines).isEmpty,
        s"mergeUpsert at $table: live deletion vectors would hide " +
          "upserted keys — materializeDeletes first")
      requireNoExternal(lines, table, "mergeUpsert")
      checkSchemaOf(s, table, source.schema, allowEvolve = false)
      // CHECK constraints bind the NEW rows (the upserted source) —
      // refused before any data write or claim
      requireChecks(source, checkLinesOf(lines), table, "mergeUpsert")
      val dirs = lines.filterNot(_.startsWith("#"))
      val srcKeys = source.select(source(keyCol)).distinct()
      val (nSrc, nSrcKeys) = {
        import org.apache.spark.sql.functions.{count, countDistinct, lit}
        val r = source.agg(count(lit(1)), countDistinct(source(keyCol))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(nSrc == nSrcKeys,
        s"mergeUpsert at $table: source is not key-unique on '$keyCol' " +
          s"($nSrc rows, $nSrcKeys keys) — resolve duplicates upstream")
      val hitFiles = applyRenames(lines,
          readDirsRaw(s, table, lines, dirs, withFile = true))
        .join(srcKeys, Seq(keyCol), "left_semi")
        .select(org.apache.spark.sql.functions.col("__f").as("f"))
        .distinct().collect().map(_.getString(0))
      val hitDirs = dirs.filter(d => hitFiles.exists(_.contains(s"/$d/"))).toSet
      val carried = dirs.filterNot(hitDirs)
      val hitRows =
        if (hitDirs.isEmpty) None
        else Some(applyRenames(lines, readDirsRaw(s, table, lines, hitDirs.toSeq)))
      // preimages (the feed's delete side) and survivors in the same
      // O(hit dirs) pass — hit dirs hold BOTH kinds of row
      val survivorDir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      val preDir = s"data/cdf-${java.util.UUID.randomUUID().toString.take(13)}"
      var nUpdated = 0L
      hitRows.foreach { hr =>
        val pre = hr.join(srcKeys, Seq(keyCol), "left_semi")
        pre.write.mode("errorifexists").parquet(s"$table/$preDir")
        // matched KEYS, not preimage rows: a target holding duplicate
        // rows for one key would otherwise overcount nUpdated and push
        // nInserted wrong (possibly negative) — source uniqueness is
        // enforced above, target uniqueness is not
        nUpdated = s.read.parquet(s"$table/$preDir")
          .select(keyCol).distinct().count()
        hr.join(srcKeys, Seq(keyCol), "left_anti")
          .write.mode("errorifexists").parquet(s"$table/$survivorDir")
      }
      val srcDir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      source.write.mode("errorifexists").parquet(s"$table/$srcDir")
      val newDirs = carried ++
        (if (hitDirs.isEmpty) Nil else Seq(survivorDir)) :+ srcDir
      val ddl = schemaOf(s, table, prev).getOrElse(source.schema.toDDL)
      val propLines = props.toSeq.sortBy(_._1)
        .map { case (k, v0) => s"#prop ${enc(k)} ${enc(v0)}\n" }.mkString
      val header = maintenanceHeader(s, table, prev, ddl, carried.toSet,
        changeKind = "merge") + propLines +
        (if (hitDirs.isEmpty) "" else s"#cdfdel $preDir\n") +
        s"#cdfins $srcDir\n" +
        dirRowsLines(f, table,
          (if (hitDirs.isEmpty) Nil else Seq(survivorDir)) :+ srcDir)
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + newDirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, nUpdated, nSrc - nUpdated)
      }
      // lost the race: computed against a superseded chain — abandon
      f.delete(new Path(s"$table/$survivorDir"), true): Unit
      f.delete(new Path(s"$table/$preDir"), true): Unit
      f.delete(new Path(s"$table/$srcDir"), true): Unit
      attempt += 1
    }
    sys.error(s"mergeUpsert on $table lost the version race $maxAttempts times")
  }

  /** DELETE + MERGE as ONE atomic snapshot commit — the transactional
    * apply step a change-feed consumer needs
    * ([[graft.streaming.ChangeFeedSync.replicateOnce]]): a sync range
    * collapses to net DELETES and net UPSERTS per key, and applying
    * them as two commits ([[deleteKeysCow]] then [[mergeUpsert]])
    * leaves a crash window where the delete landed but the merge did
    * not — the consumer replays the whole range (convergent, but only
    * at-least-once) and the table's own change feed records
    * self-cancelling delete+insert pairs. Here both legs publish under
    * ONE manifest claim: rows whose key is in `deleteKeys` leave, rows
    * whose key is in `source` are replaced, fresh source keys append —
    * and the header carries the merge provenance (`#cdfdel` = visible
    * preimages of replaced AND deleted rows, `#cdfins` = the source
    * directory), the commit properties, and an optional `(writerId,
    * batchId)` transaction tag in the same atomic publish. A replayed
    * or concurrent duplicate of the same tag no-ops BEFORE any data
    * writes — the consumer's apply becomes EXACTLY-ONCE and its feed
    * stays clean.
    *
    * The version records `#change merge`: [[changeFeed]] emits
    * delete(preimage) for every removed-or-replaced visible row and
    * insert(postimage) for every source row, so the fold law
    * `read(v) = read(v−1) − deletes + inserts` holds exactly.
    *
    * Cost model and guard rails are [[mergeUpsert]]'s: hit discovery is
    * one semi-join-pruned `input_file_name` pass over the union of both
    * key sets, untouched directories carry by reference — O(affected
    * files + source + deleteKeys), never O(table). The source must be
    * key-unique; `deleteKeys` and source keys must be DISJOINT (a key
    * both deleted and upserted in one apply is ambiguous — collapse to
    * one outcome upstream, the way a last-writer-wins fold does); live
    * deletion vectors refuse; schema must match the committed contract
    * exactly. CAS posture identical to [[deleteWhere]].
    *
    * NO-OP ELIMINATION: an upsert whose key currently holds exactly one
    * value-identical row (null-safe comparison over every column) is
    * dropped before the rewrite — it is a MOVED row, not a changed one.
    * The case matters because [[restoreTo]]'s zero-copy feed is a
    * DIRECTORY-level diff: it re-emits every row a prior CoW rewrite
    * relocated, and a consumer applying that verbatim would rewrite
    * unchanged directories (write amplification O(moved), not O(net))
    * and stamp self-cancelling delete+insert pairs into its own feed,
    * breaking the faithful-re-emission contract a further downstream
    * tier relies on (the q95 cascade gate). Detection costs one
    * O(hit dirs) comparison pass; directories hit only by
    * moved-not-modified rows carry by reference. `nUpdated`/`nInserted`
    * count NET changes (no-ops excluded).
    *
    * @return Some((version, nDeleted, nUpdated, nInserted)) — key
    *         counts, not row counts — or None when the (writerId,
    *         batchId) transaction already committed
    */
  def applyChangesCow(s: SparkSession, table: String, deleteKeys: DataFrame,
      source: DataFrame, keyCol: String,
      txn: Option[(String, Long)] = None, maxAttempts: Int = 50,
      props: Map[String, String] = Map.empty): Option[(Int, Long, Long, Long)] = {
    require(props.keys.forall(_.nonEmpty), "applyChangesCow: empty property key")
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      if (txn.exists { case (w, b) => txnSeenUpTo(s, table, w, b, prev) })
        return None
      val lines = manifestLines(s, table, prev)
      require(dvLinesOf(lines).isEmpty,
        s"applyChangesCow at $table: live deletion vectors would hide " +
          "upserted keys — materializeDeletes first")
      requireNoExternal(lines, table, "applyChangesCow")
      checkSchemaOf(s, table, source.schema, allowEvolve = false)
      // CHECK constraints bind the NEW rows (the upserted source;
      // deletes cannot violate) — refused before any write or claim,
      // so a replicated batch that violates the replica's constraint
      // refuses exactly like a direct commit would
      requireChecks(source, checkLinesOf(lines), table, "applyChangesCow")
      val dirs = lines.filterNot(_.startsWith("#"))
      val delKeysD = deleteKeys.select(deleteKeys(keyCol)).distinct()
      val srcKeys = source.select(source(keyCol)).distinct()
      val (nSrc, nSrcKeys) = {
        import org.apache.spark.sql.functions.{count, countDistinct, lit}
        val r = source.agg(count(lit(1)), countDistinct(source(keyCol))).head()
        (r.getLong(0), r.getLong(1))
      }
      require(nSrc == nSrcKeys,
        s"applyChangesCow at $table: source is not key-unique on " +
          s"'$keyCol' ($nSrc rows, $nSrcKeys keys) — resolve duplicates " +
          "upstream")
      require(delKeysD.join(srcKeys, Seq(keyCol), "left_semi")
          .limit(1).count() == 0,
        s"applyChangesCow at $table: deleteKeys and source keys overlap " +
          "— a key both deleted and upserted in one apply is ambiguous; " +
          "collapse to one outcome per key upstream")
      val allKeys = delKeysD.unionByName(srcKeys).distinct()
      // PASS 1 — candidate hit discovery over the whole chain (footer-
      // pruned by the key semi-join), exactly the deleteWhere shape
      val hitFiles0 = applyRenames(lines,
          readDirsRaw(s, table, lines, dirs, withFile = true))
        .join(allKeys, Seq(keyCol), "left_semi")
        .select(org.apache.spark.sql.functions.col("__f").as("f"))
        .distinct().collect().map(_.getString(0))
      val hitDirs0 = dirs.filter(d => hitFiles0.exists(_.contains(s"/$d/"))).toSet
      // PASS 2 — NO-OP ELIMINATION, O(hit dirs) only: an upsert whose
      // key currently holds EXACTLY ONE row with value-identical
      // columns (null-safe) is not a change — a restore's directory-
      // level diff re-emits every row a CoW rewrite MOVED but did not
      // modify, and applying those verbatim would rewrite unchanged
      // directories and record self-cancelling delete+insert pairs in
      // this table's own feed (poisoning any further downstream tier).
      // Dropping them keeps the apply O(net changes): directories hit
      // only by moved-not-modified rows carry by reference.
      val (noopKeys, nNoop) =
        if (hitDirs0.isEmpty)
          (None, 0L)
        else {
          import org.apache.spark.sql.functions.{count => cnt, lit, sum, when}
          val hitRowsF = applyRenames(lines,
            readDirsRaw(s, table, lines, hitDirs0.toSeq))
          val srcP = source.select(source.columns.toIndexedSeq.map(c =>
            source(c).as(s"__s_$c")): _*)
          val joined = hitRowsF.join(srcP,
            hitRowsF(keyCol) === srcP(s"__s_$keyCol"), "inner")
          // a contract column ABSENT from every hit file (rows predating
          // an additive evolution) reads as NULL — compare against that
          val hitCols = hitRowsF.columns.toSet
          val same = source.columns.filterNot(_ == keyCol).toIndexedSeq
            .map(c =>
              if (hitCols(c)) joined(c) <=> joined(s"__s_$c")
              else joined(s"__s_$c").isNull)
            .reduceOption(_ && _).getOrElse(lit(true))
          val nk = joined.groupBy(joined(keyCol))
            .agg(cnt(lit(1)).as("__n"),
              sum(when(same, 1L).otherwise(0L)).as("__eq"))
            .filter(org.apache.spark.sql.functions.col("__n") === 1 &&
              org.apache.spark.sql.functions.col("__eq") === 1)
            .select(joined(keyCol))
          // count FIRST, checkpoint only on a hit: the common case (no
          // no-ops — every ordinary merge) pays exactly one O(hit dirs)
          // job for the check, not a materialization too
          val n = nk.count()
          (if (n == 0) None else Some(nk.localCheckpoint()), n)
        }
      def dropNoop(df: DataFrame): DataFrame =
        noopKeys.map(nk => df.join(nk, Seq(keyCol), "left_anti")).getOrElse(df)
      val effSource = dropNoop(source)
      val effKeys = dropNoop(allKeys)
      // refine the hit set under the effective keys: O(hit dirs)
      val hitDirs =
        if (noopKeys.isEmpty) hitDirs0
        else if (hitDirs0.isEmpty) hitDirs0
        else {
          val files2 = applyRenames(lines,
              readDirsRaw(s, table, lines, hitDirs0.toSeq, withFile = true))
            .join(effKeys, Seq(keyCol), "left_semi")
            .select(org.apache.spark.sql.functions.col("__f").as("f"))
            .distinct().collect().map(_.getString(0))
          hitDirs0.filter(d => files2.exists(_.contains(s"/$d/")))
        }
      val carried = dirs.filterNot(hitDirs)
      val hitRows =
        if (hitDirs.isEmpty) None
        else Some(applyRenames(lines, readDirsRaw(s, table, lines, hitDirs.toSeq)))
      val survivorDir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      val preDir = s"data/cdf-${java.util.UUID.randomUUID().toString.take(13)}"
      var nUpdated = 0L
      var nDeleted = 0L
      hitRows.foreach { hr =>
        // preimages of BOTH legs (replaced + deleted rows) in one
        // sidecar — every one is a delete event to the feed — and the
        // survivors in the same O(hit dirs) pass
        hr.join(effKeys, Seq(keyCol), "left_semi")
          .write.mode("errorifexists").parquet(s"$table/$preDir")
        val preKeys = s.read.parquet(s"$table/$preDir")
          .select(keyCol).distinct()
        nUpdated = preKeys.join(srcKeys, Seq(keyCol), "left_semi").count()
        nDeleted = preKeys.join(delKeysD, Seq(keyCol), "left_semi").count()
        hr.join(effKeys, Seq(keyCol), "left_anti")
          .write.mode("errorifexists").parquet(s"$table/$survivorDir")
      }
      val srcDir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      effSource.write.mode("errorifexists").parquet(s"$table/$srcDir")
      val newDirs = carried ++
        (if (hitDirs.isEmpty) Nil else Seq(survivorDir)) :+ srcDir
      val ddl = schemaOf(s, table, prev).getOrElse(source.schema.toDDL)
      val propLines = props.toSeq.sortBy(_._1)
        .map { case (k, v0) => s"#prop ${enc(k)} ${enc(v0)}\n" }.mkString
      val header = maintenanceHeader(s, table, prev, ddl, carried.toSet,
        changeKind = "merge") +
        txn.map { case (w, b) => txnLine(w, b) + "\n" }.getOrElse("") +
        propLines +
        (if (hitDirs.isEmpty) "" else s"#cdfdel $preDir\n") +
        s"#cdfins $srcDir\n" +
        dirRowsLines(f, table,
          (if (hitDirs.isEmpty) Nil else Seq(survivorDir)) :+ srcDir)
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + newDirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        noopKeys.foreach(graft.ops.Checkpoints.free)
        return Some((v, nDeleted, nUpdated, nSrc - nNoop - nUpdated))
      }
      // lost the race: computed against a superseded chain — abandon
      noopKeys.foreach(graft.ops.Checkpoints.free)
      f.delete(new Path(s"$table/$survivorDir"), true): Unit
      f.delete(new Path(s"$table/$preDir"), true): Unit
      f.delete(new Path(s"$table/$srcDir"), true): Unit
      attempt += 1
    }
    sys.error(s"applyChangesCow on $table lost the version race $maxAttempts times")
  }

  /** RESTORE — roll the table HEAD back to `targetV`'s exact content as
    * a NEW commit (the Delta `RESTORE TABLE … VERSION AS OF` shape):
    * history is preserved (the rolled-back versions stay
    * time-travelable until [[vacuum]]), the restored head is an
    * ordinary version (re-restore forward to undo a restore), and the
    * operation is PURE METADATA — the new manifest re-references
    * `targetV`'s directories (zero rows copied; vacuum keeps them live
    * while any retained manifest references them, so a retention-1
    * vacuum after a restore keeps exactly the restored state).
    *
    * CHANGE-FEED EXACTNESS at zero copy cost: the commit records
    * `#change merge` whose sidecars are directory REFERENCES — every
    * head-only directory rides a `#cdfdel` line (its rows are the
    * delete preimages), every target-only directory a `#cdfins` line
    * (its rows the restored postimages); directories live at BOTH
    * versions emit nothing (CoW directories are immutable, so their
    * rows are identical by construction). A row a CoW delete moved from
    * directory D to survivor S emits delete(S-row) + insert(D-row) in
    * the one restore version and the standard insert-outranks-delete
    * fold keeps it live. Folding the feed through a restore therefore
    * reconstructs the rollback exactly, and every CDF consumer
    * ([[graft.streaming.ChangeFeedSync]]) converges through it
    * untouched, at O(rewritten-since-target rows) feed cost — the same
    * order as the operations being rolled back. Removed directories'
    * `#spec` lines carry so the feed's raw preimage read resolves
    * partitioned history; the next maintenance commit drops them.
    *
    * REFUSALS (loud, before any write): live deletion vectors at either
    * end (tombstones hide rows from the directory-level diff —
    * [[materializeDeletes]] first); a `#schema` or rename-mapping
    * difference between head and target (a restore that silently rolled
    * the CONTRACT back would poison feed consumers mid-range — evolve
    * or rename explicitly instead); a vacuumed target manifest raises
    * the typed [[OutOfRetentionException]]. Prior `#txn` tags CARRY: a
    * restore rolls data back, it never reopens committed producer
    * batches to replay — re-landing rolled-back data is a deliberate
    * new batch, not an idempotence hole.
    *
    * @return Some(new version), or None when `txn` says this restore
    *         already landed (a replayed orchestration step)
    */
  def restoreTo(s: SparkSession, table: String, targetV: Int,
      txn: Option[(String, Long)] = None,
      props: Map[String, String] = Map.empty,
      maxAttempts: Int = 50): Option[Int] = {
    require(props.keys.forall(_.nonEmpty), "restoreTo: empty property key")
    val f = fs(s, table)
    val tgtLines =
      try manifestLines(s, table, targetV)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new OutOfRetentionException(table, targetV,
            earliestFeedable(s, table))
      }
    require(dvLinesOf(tgtLines).isEmpty,
      s"restoreTo $table v$targetV: the target carries live deletion " +
        "vectors — restore to a materialized version")
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(targetV >= 1 && targetV < prev,
        s"restoreTo $table: target v$targetV must precede head v$prev")
      if (txn.exists { case (w, b) => txnSeenUpTo(s, table, w, b, prev) })
        return None
      val prevLines = manifestLines(s, table, prev)
      require(dvLinesOf(prevLines).isEmpty,
        s"restoreTo $table: head v$prev carries live deletion vectors — " +
          "materializeDeletes first (tombstones hide rows from the " +
          "directory-level diff)")
      // rename check FIRST: a rename changes the #schema DDL too, and
      // "rename back first" is the actionable message for that case
      def renSet(ls: Seq[String]) = ls.filter(_.startsWith("#rename ")).toSet
      require(renSet(prevLines) == renSet(tgtLines),
        s"restoreTo $table: rename mapping differs between head v$prev " +
          s"and target v$targetV — restore across a column rename is " +
          "not supported; rename back first")
      def ddlOf(ls: Seq[String]) = ls.find(_.startsWith("#schema "))
      require(ddlOf(prevLines) == ddlOf(tgtLines),
        s"restoreTo $table: schema differs between head v$prev and " +
          s"target v$targetV — a restore never rolls the contract " +
          "back; evolve explicitly instead")
      // same rule for CHECK constraints: a check added AFTER the target
      // was never validated against the target's rows, and a restore
      // that silently dropped one would unbind future writers — change
      // the constraint set explicitly around the restore
      require(checkLinesOf(prevLines).toSet == checkLinesOf(tgtLines).toSet,
        s"restoreTo $table: CHECK constraints differ between head " +
          s"v$prev and target v$targetV — a restore never changes the " +
          "contract; dropCheck/addCheck explicitly instead")
      val tgtDirs = tgtLines.filterNot(_.startsWith("#"))
      val prevDirs = prevLines.filterNot(_.startsWith("#"))
      val removed = prevDirs.filterNot(tgtDirs.toSet)
      val added = tgtDirs.filterNot(prevDirs.toSet)
      val txns = prevLines.filter(_.startsWith("#txn "))
      val tgtMeta = tgtLines.filter(l =>
        l.startsWith("#dirstats ") || l.startsWith("#dirstatsS ") ||
          l.startsWith("#dirbloom ") || l.startsWith("#dirrows ") ||
          l.startsWith("#spec "))
      val removedSpec = prevLines.filter(_.startsWith("#spec "))
        .filter(l => removed.contains(l.split(" ")(1)))
      val propLines = (props + ("restore_of" -> targetV.toString)).toSeq
        .sortBy(_._1)
        .map { case (k, v0) => s"#prop ${enc(k)} ${enc(v0)}\n" }.mkString
      val header = (txns ++ ddlOf(tgtLines).toSeq ++ tgtMeta ++
          removedSpec ++ renSet(tgtLines).toSeq.sorted ++
          tgtLines.filter(_.startsWith("#check ")) ++
          Seq("#change merge")).map(_ + "\n").mkString +
        txn.map { case (w, b) => txnLine(w, b) + "\n" }.getOrElse("") +
        propLines +
        removed.map(d => s"#cdfdel $d\n").mkString +
        added.map(d => s"#cdfins $d\n").mkString
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + tgtDirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return Some(v)
      }
      attempt += 1
    }
    sys.error(s"restoreTo on $table lost the version race $maxAttempts times")
  }

  /** SHALLOW CLONE — a new table whose first version REFERENCES the
    * source's data directories instead of copying them (the Delta
    * `CREATE TABLE … SHALLOW CLONE` shape): a dev/test/experimentation
    * copy of a 100 TB table costs ONE manifest write, O(metadata). The
    * directory tokens absolutize into the source's path (the external
    * form [[resolveDirPath]] resolves), and stats/spec/rename lines
    * copy with re-keyed tokens — so reads, time travel, pruning, and
    * the rename mapping all work on the clone unchanged. The clone is
    * a REAL table from then on: appends, MoR deletes, renames,
    * restores, compactions, and further clones land in its OWN chain
    * and never touch the source; its change feed starts with the full
    * content as version-1 inserts, so CDF consumers can replicate off
    * a clone. Source `#txn` tags deliberately do NOT copy: producer
    * idempotence belongs to the source's pipeline — a producer pointed
    * at the clone is a new pipeline whose batches should land.
    *
    * DIVERGENCE CONTRACT: copy-on-write rewrites (deleteWhere,
    * deleteKeysCow, mergeUpsert, applyChangesCow, materializeDeletes)
    * anchor their file-level hit mapping on table-relative tokens and
    * REFUSE while external references remain — run [[deepenClone]]
    * (folds all externals local) or let [[compactSmall]] /
    * [[optimizeClustered]] fold them as part of routine maintenance.
    *
    * THE VACUUM CAVEAT (Delta's, verbatim): the source does not know
    * its clones. A vacuum on the SOURCE that expires directories the
    * clone references breaks the clone — deepen the clone (or pin the
    * cloned version with a source-side tag) before shortening source
    * retention. A vacuum on the CLONE is always safe: external paths
    * are never GC candidates (GC lists only the clone's local
    * `data/`).
    *
    * Refusals: a non-empty target; live deletion vectors at the cloned
    * source version (their key files belong to the source's
    * maintenance lifecycle — materialize first); a vacuumed source
    * version raises the typed [[OutOfRetentionException]].
    */
  def cloneShallow(s: SparkSession, sourceTable: String,
      cloneTable: String, version: Option[Int] = None): Int = {
    // external references are recognized by their leading '/'
    // ([[resolveDirPath]]), so the source must be a SCHEME-LESS ABSOLUTE
    // path: a URI-addressed (s3a://, hdfs://, file:) or relative source
    // would publish tokens that don't start with '/' — the clone would
    // resolve them UNDER ITS OWN PATH (unreadable) and the CoW-refusal
    // contract ([[requireNoExternal]]) would silently miss them
    val srcUri = new Path(sourceTable).toUri
    require(srcUri.getScheme == null && sourceTable.startsWith("/"),
      s"cloneShallow: source '$sourceTable' must be a scheme-less " +
        "absolute path — external directory tokens are classified by " +
        "their leading '/'; strip the URI scheme (or mount the store " +
        "at a path) before cloning")
    val srcV = version.getOrElse(latestVersion(s, sourceTable))
    require(srcV >= 1, s"cloneShallow: nothing committed at $sourceTable")
    require(latestVersion(s, cloneTable) < 1,
      s"cloneShallow: $cloneTable already has commits")
    val lines =
      try manifestLines(s, sourceTable, srcV)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new OutOfRetentionException(sourceTable, srcV,
            earliestFeedable(s, sourceTable))
      }
    require(dvLinesOf(lines).isEmpty,
      s"cloneShallow: $sourceTable v$srcV carries live deletion " +
        "vectors — materializeDeletes first")
    def abs(d: String) = if (d.startsWith("/")) d else s"$sourceTable/$d"
    val dirs = lines.filterNot(_.startsWith("#")).map(abs)
    val schema = lines.filter(_.startsWith("#schema "))
    val rens = lines.filter(_.startsWith("#rename "))
    val meta = lines.filter(l => l.startsWith("#dirstats ") ||
        l.startsWith("#dirstatsS ") || l.startsWith("#dirrows ") ||
        l.startsWith("#spec "))
      .map { l =>
        val parts = l.split(" ")
        (parts.take(1) ++ Seq(abs(parts(1))) ++ parts.drop(2)).mkString(" ")
      } ++
      // bloom lines re-key BOTH tokens: the described dir AND the
      // sidecar file live in the source's storage
      lines.filter(_.startsWith("#dirbloom ")).map { l =>
        val parts = l.split(" ")
        Seq(parts(0), abs(parts(1)), parts(2), abs(parts(3))).mkString(" ")
      }
    val props = Seq(
      s"#prop ${enc("clone_of")} ${enc(s"$sourceTable@$srcV")}")
    // the clone INHERITS the source's CHECK constraints verbatim —
    // expressions reference column names only, nothing to re-key
    val checks = lines.filter(_.startsWith("#check "))
    val header = (schema ++ meta ++ rens ++ checks ++ props ++
        Seq("#change append"))
      .map(_ + "\n").mkString
    val f = fs(s, cloneTable)
    require(publishExclusive(s, f, manifestPath(cloneTable, 1),
        header + dirs.mkString("\n")),
      s"cloneShallow: lost the claim on $cloneTable v1 — a concurrent " +
        "creator got there first")
    try atomicWrite(s, f, new Path(s"$cloneTable/_latest"), "1")
    catch { case _: java.io.IOException => () }
    1
  }

  /** Fold every EXTERNAL (shallow-clone) directory reference into the
    * table's OWN storage — the incremental shallow→deep conversion:
    * one pass reads the external directories raw (rename-normalized to
    * the current contract, partitioned externals' partition columns
    * materialized as data) and rewrites them as ONE local directory;
    * local directories carry by reference. Costs O(external bytes),
    * emits NOTHING to the change feed (`#change compact` — moves
    * bytes, never rows), and keeps any `#dv` tombstones suppressing
    * exactly as before (the rewrite copies raw rows; the anti-join
    * stays). After deepening, every copy-on-write op is available and
    * source-side vacuums can no longer break this table. CAS posture
    * identical to [[compactSmall]]: lost race ⇒ abandon orphan,
    * recompute.
    *
    * @return (version, externalsFolded) — version unchanged when the
    *         table has no external references
    */
  def deepenClone(s: SparkSession, table: String,
      maxAttempts: Int = 50): (Int, Int) = {
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val prevAllLines = manifestLines(s, table, prev)
      val dirs = prevAllLines.filterNot(_.startsWith("#"))
      val (ext, local) = dirs.partition(_.startsWith("/"))
      if (ext.isEmpty) return (prev, 0)
      val folded = applyRenames(prevAllLines,
        readDirsRaw(s, table, prevAllLines, ext))
      val dir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      folded.write.mode("errorifexists").parquet(s"$table/$dir")
      val v = prev + 1
      val ddl = schemaOf(s, table, prev).getOrElse(folded.schema.toDDL)
      val header = maintenanceHeader(s, table, prev, ddl, local.toSet,
        changeKind = "compact") + dirRowsLines(f, table, Seq(dir))
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + (local :+ dir).mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, ext.size)
      }
      f.delete(new Path(s"$table/$dir"), true): Unit
      attempt += 1
    }
    sys.error(s"deepenClone on $table lost the version race $maxAttempts times")
  }

  /** One recommended maintenance step: which op, the observed metric
    * that crossed its threshold, and the operator-facing reason.
    */
  final case class MaintenanceAction(action: String, metric: Long,
    threshold: Long, reason: String)

  /** MAINTENANCE PLANNER — the ops-layer decision a 100 TB lake runs on
    * a schedule (the Delta auto-compaction / Iceberg maintenance-action
    * shape): inspect ONE version's METADATA and return the ordered list
    * of maintenance actions whose trigger thresholds are crossed. Pure
    * inspection — directory sizes come from the filesystem listing, dv
    * cost from the key-file row counts (O(tombstones), the same order
    * every read's anti-join probe already pays), history depth from the
    * manifest listing, externals from the dir tokens; no data file is
    * opened. The returned order IS the safe application order:
    * [[deepenClone]] first (CoW ops refuse on externals),
    * [[materializeDeletes]] before [[compactSmall]] (compacting
    * dv-hidden rows copies dead bytes the materialize pass would then
    * rewrite again), [[vacuum]] last (GC after the rewrites orphan
    * their inputs). An empty plan = steady state.
    */
  def maintenancePlan(s: SparkSession, table: String, smallBytes: Long,
      maxDvKeys: Long, maxVersions: Int,
      maxSmallDirs: Int = 1): Seq[MaintenanceAction] = {
    require(smallBytes > 0 && maxDvKeys >= 0 && maxVersions >= 1 &&
        maxSmallDirs >= 1,
      s"maintenancePlan: bad thresholds ($smallBytes, $maxDvKeys, " +
        s"$maxVersions, $maxSmallDirs)")
    val f = fs(s, table)
    val latest = latestVersion(s, table)
    require(latest >= 1, s"nothing committed at $table")
    val lines = manifestLines(s, table, latest)
    val dirs = lines.filterNot(_.startsWith("#"))
    val ext = dirs.count(_.startsWith("/"))
    val out = scala.collection.mutable.ListBuffer[MaintenanceAction]()
    if (ext > 0)
      out += MaintenanceAction("deepenClone", ext, 0,
        s"$ext external (shallow-clone) dir(s) block CoW maintenance " +
          "and expose the table to source-side vacuums")
    val dvs = dvLinesOf(lines)
    // distinct over the dv-key UNION — what [[applyDv]]'s anti-join
    // actually probes: overlapping MoR deletes across versions would
    // otherwise double-count a tombstoned key and inflate the metric
    val dvKeys =
      if (dvs.isEmpty) 0L
      else s.read.parquet(
        dvs.map(t => resolveDirPath(table, t._1)): _*).distinct().count()
    if (dvKeys > maxDvKeys)
      out += MaintenanceAction("materializeDeletes", dvKeys, maxDvKeys,
        s"$dvKeys tombstoned key(s) make every read pay the anti-join " +
          "probe")
    // external dirs stay out of the small count: the deepen pass above
    // already folds them, and counting them twice would double-plan
    val small = dirs.filterNot(_.startsWith("/")).count { d =>
      f.getContentSummary(new Path(resolveDirPath(table, d)))
        .getLength < smallBytes
    }
    if (small > maxSmallDirs)
      out += MaintenanceAction("compactSmall", small, maxSmallDirs,
        s"$small sub-threshold dir(s) inflate every reader's file list")
    // [[vacuum]] PINS tagged versions: a tag older than the retention
    // cutoff keeps its manifest through every pass, so counting it
    // would re-trigger vacuum forever and the documented apply-converge
    // fixpoint ("empty plan = steady state") could never terminate —
    // the metric mirrors vacuum's own tagged/cutoff logic and counts
    // only the manifests a vacuum at `maxVersions` could reclaim plus
    // the retained window itself
    val manifestVs = f.globStatus(new Path(s"$table/manifest-v*.txt")) match {
      case null => Seq.empty[Int]
      case sts => sts.toSeq.map(_.getPath.getName
        .stripPrefix("manifest-v").stripSuffix(".txt").toInt)
    }
    val vacCutoff = math.max(1, latest - maxVersions + 1)
    val pinned = tagsOf(s, table).values.toSet
    val manifests = manifestVs.count(v => v >= vacCutoff || !pinned(v))
    if (manifests > maxVersions)
      out += MaintenanceAction("vacuum", manifests, maxVersions,
        s"$manifests retained manifest(s) exceed the retention target")
    out.toList
  }

  /** MATERIALIZE accumulated deletion vectors — the read-optimize half
    * of the merge-on-read lifecycle ([[deleteWhereMoR]] writes O(keys),
    * reads pay an anti-join probe; this folds the tombstones into the
    * data once the probe cost outgrows a rewrite): directories that
    * CONTAIN tombstoned rows rewrite their survivors into one fresh
    * directory (hit discovery = one semi-join-pruned pass mapping
    * matches to dirs via `input_file_name`, the [[deleteWhere]] shape),
    * untouched directories carry by reference, and the new manifest
    * drops every `#dv` line — the ONE operation allowed to, because the
    * rewrite just removed what they suppressed. Consequences: reads of
    * the new version stop paying the anti-join, and the key-tombstone
    * suppression of future re-inserts is LIFTED (re-admitting a deleted
    * key = materialize, then insert). Orphaned dv directories stay for
    * [[vacuum]] (older manifests still reference them for time travel).
    * CAS posture identical to [[deleteWhere]].
    *
    * @return (version, dirsCarried, dirsRewritten) — the current
    *         version unchanged when no dv lines exist
    */
  def materializeDeletes(s: SparkSession, table: String,
      maxAttempts: Int = 50): (Int, Int, Int) = {
    import org.apache.spark.sql.functions.input_file_name
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val lines = manifestLines(s, table, prev)
      val dvs = dvLinesOf(lines)
      val dirs = lines.filterNot(_.startsWith("#"))
      if (dvs.isEmpty) return (prev, dirs.size, 0)
      requireNoExternal(lines, table, "materializeDeletes")
      val keyCols = dvs.map(_._2).distinct
      require(keyCols.size == 1,
        s"mixed dv key columns at $table: $keyCols — one key per table")
      val keyCol = keyCols.head
      val keys = s.read.parquet(
        dvs.map(t => resolveDirPath(table, t._1)): _*).distinct()
      // input_file_name() must bind directly over the scan (it rejects
      // multi-source plans), so project it BEFORE the semi join; the
      // rename mapping folds pre-rename dirs into the current contract
      // (the dv key column itself is rename-protected by renameColumn)
      val hitFiles = applyRenames(lines,
          readDirsRaw(s, table, lines, dirs, withFile = true))
        .join(keys, Seq(keyCol), "left_semi")
        .select(org.apache.spark.sql.functions.col("__f").as("f"))
        .distinct().collect().map(_.getString(0))
      val hitDirs = dirs.filter(d => hitFiles.exists(_.contains(s"/$d/"))).toSet
      val carried = dirs.filterNot(hitDirs)
      val survivors =
        if (hitDirs.isEmpty) None
        else Some(applyRenames(lines,
            readDirsRaw(s, table, lines, hitDirs.toSeq))
          .join(keys, Seq(keyCol), "left_anti"))
      val dir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      survivors.foreach(_.write.mode("errorifexists").parquet(s"$table/$dir"))
      val newDirs = carried ++ survivors.map(_ => dir).toSeq
      val v = prev + 1
      val ddl = schemaOf(s, table, prev).getOrElse(
        read(s, table, Some(prev)).schema.toDDL)
      val header = maintenanceHeader(s, table, prev, ddl, carried.toSet,
        keepDv = false, changeKind = "materialize") +
        dirRowsLines(f, table, survivors.map(_ => dir).toSeq)
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + newDirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, carried.size, hitDirs.size)
      }
      if (survivors.nonEmpty) f.delete(new Path(s"$table/$dir"), true): Unit
      attempt += 1
    }
    sys.error(s"materializeDeletes on $table lost the race $maxAttempts times")
  }

  /** OPTIMIZE / small-file compaction as a snapshot commit: commit
    * directories whose total size is below `smallBytes` rewrite into ONE
    * fresh directory (`targetFiles` parquet parts); directories already
    * big enough carry by reference. Readers of the new version see the
    * IDENTICAL row multiset — compaction moves bytes, never semantics —
    * and every historical version still time-travels (its manifest
    * references the original directories until [[vacuum]] expires it).
    *
    * This is the append-heavy table's maintenance loop: streaming and
    * micro-batch commits each land a small directory ([[commitIfAbsent]]),
    * and without periodic compaction the manifest's file list — and every
    * reader's footer-open count — grows with COMMITS, not data. Cost is
    * O(small dirs), the same contract as [[deleteWhere]]; sizes come from
    * the filesystem listing (metadata scale). CAS posture identical to
    * [[deleteWhere]]: lost race ⇒ abandon + recompute.
    *
    * @return (version, dirsCompacted, dirsCarried) — `version` the new
    *         version, or the current one when fewer than 2 dirs qualify
    */
  def compactSmall(s: SparkSession, table: String, smallBytes: Long,
      targetFiles: Int = 1, maxAttempts: Int = 50): (Int, Int, Int) = {
    require(smallBytes > 0 && targetFiles >= 1,
      s"bad compaction params: $smallBytes/$targetFiles")
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val prevAllLines = manifestLines(s, table, prev)
      val dirs = prevAllLines.filterNot(_.startsWith("#"))
      val (small, big) = dirs.partition { d =>
        f.getContentSummary(new Path(resolveDirPath(table, d)))
          .getLength < smallBytes
      }
      if (small.size < 2) return (prev, 0, dirs.size)
      // rename-normalize the rewrite: the compacted directory is born
      // under the CURRENT column contract even when its inputs predate
      // a rename (the mapping stays a no-op for them afterwards); a
      // partitioned input dir normalizes to flat with the partition
      // column materialized as data — compaction IS the incremental
      // old-spec migration path
      val compacted = applyRenames(prevAllLines,
          readDirsRaw(s, table, prevAllLines, small))
        .repartition(targetFiles)
      val dir = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
      compacted.write.mode("errorifexists").parquet(s"$table/$dir")
      val v = prev + 1
      val header = maintenanceHeader(s, table, prev,
        compacted.schema.toDDL, big.toSet, changeKind = "compact") +
        dirRowsLines(f, table, Seq(dir))
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + (big :+ dir).mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, small.size, big.size)
      }
      f.delete(new Path(s"$table/$dir"), true): Unit
      attempt += 1
    }
    sys.error(s"compactSmall on $table lost the version race $maxAttempts times")
  }

  /** Expire history: drop every version older than the newest
    * `keepVersions`, then GC data directories no RETAINED manifest
    * references — both crashed-commit orphans and directories only old
    * manifests named. Ordered for crash safety the same way commits
    * are: retired MANIFESTS delete first (the version stops being
    * resolvable before its files go), then unreferenced data dirs — a
    * vacuum that dies mid-way leaves extra files, never a readable
    * version with missing data. In-flight readers that already resolved
    * an expiring manifest keep their plan's file list; vacuum only
    * deletes what retained versions don't reference, so run it with a
    * retention window ≥ the longest reader (the Iceberg/Delta
    * `expire_snapshots`/`VACUUM` contract, including its caveat).
    *
    * ORPHAN GRACE — the in-flight-commit race: a concurrent committer
    * writes its data directory BEFORE claiming a manifest, so to a
    * vacuum running in that window the directory is indistinguishable
    * from a crashed commit's orphan — deleting it would let the claim
    * land on vanished data, the one torn-table path in this design.
    * Unreferenced directories younger than `orphanGraceMs` are
    * therefore spared (the Iceberg orphan-GC retention-age rule):
    * choose a grace comfortably above the longest data-write, and only
    * pass 0 when no commit can be in flight.
    *
    * @return (manifests deleted, data directories deleted)
    */
  def vacuum(s: SparkSession, table: String, keepVersions: Int,
      orphanGraceMs: Long = 3600000L): (Int, Int) = {
    require(keepVersions >= 1, s"keepVersions must be >= 1: $keepVersions")
    require(orphanGraceMs >= 0, s"orphanGraceMs must be >= 0: $orphanGraceMs")
    val f = fs(s, table)
    val latest = latestVersion(s, table)
    require(latest >= 1, s"nothing committed at $table")
    val cutoff = math.max(1, latest - keepVersions + 1)
    // TAGGED versions are pinned: their manifests stay resolvable and
    // their directories count as referenced, whatever the retention
    // count says (the Iceberg tagged-snapshot retention rule)
    val tagged = tagsOf(s, table).values.toSet
    // referenced = data dirs PLUS deletion-vector dirs named by #dv
    // lines (GC'ing a retained manifest's dv would resurrect its keys)
    // PLUS change-feed sidecars named by #cdf lines (GC'ing one would
    // blind [[changeFeed]] over a still-resolvable version range)
    val retained = ((cutoff to latest) ++ tagged).distinct.sorted
    val keptDirs = retained.flatMap { v =>
      val lines = manifestLines(s, table, v)
      lines.filterNot(_.startsWith("#")) ++
        lines.filter(_.startsWith("#dv "))
          .map(_.stripPrefix("#dv ").split(" ")(0)) ++
        lines.filter(_.startsWith("#cdf "))
          .map(_.stripPrefix("#cdf ")) ++
        lines.filter(_.startsWith("#cdfdel "))
          .map(_.stripPrefix("#cdfdel ")) ++
        lines.filter(_.startsWith("#cdfins "))
          .map(_.stripPrefix("#cdfins ")) ++
        lines.filter(_.startsWith("#dirbloom "))
          .map(_.split(" ")(3))
    }.toSet ++ {
      // staged-but-unpublished batches are LIVE (their audit may outlast
      // any orphan grace window) — marker files reference their dirs
      val st = f.globStatus(new Path(s"$table/staged-*.txt"))
      if (st == null) Set.empty[String]
      else st.map { m =>
        s"data/c-${m.getPath.getName.stripPrefix("staged-").stripSuffix(".txt")}"
      }.toSet
    }
    var nManifests = 0
    (1 until cutoff).filterNot(tagged).foreach { v =>
      if (f.delete(manifestPath(table, v), false)) nManifests += 1
    }
    val dataRoot = new Path(s"$table/data")
    var nDirs = 0
    val now = System.currentTimeMillis()
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { st =>
        val rel = s"data/${st.getPath.getName}"
        if (!keptDirs.contains(rel) &&
            st.getModificationTime <= now - orphanGraceMs) {
          if (f.delete(st.getPath, true)) nDirs += 1
        }
      }
    }
    // a CRASHED optimizeClustered leaves its `.opt-*` staging dir
    // outside data/ — unreferenced by construction (chunks rename out
    // before the manifest claim), so reap any past the grace window
    val stale = f.globStatus(new Path(s"$table/.opt-*"))
    if (stale != null) stale.foreach { st =>
      if (st.getModificationTime <= now - orphanGraceMs) {
        if (f.delete(st.getPath, true)) nDirs += 1
      }
    }
    (nManifests, nDirs)
  }

  /** TAG a version with a NAME (the Iceberg tag / Delta "named
    * snapshot" ref): `tag-<name>.txt` records the version, created by
    * the same exclusive publish as manifests — tags are IMMUTABLE
    * (re-tagging a live name refuses; [[dropTag]] then re-tag to
    * move). A tagged version is PINNED: [[vacuum]] retains its
    * manifest and every directory it references regardless of the
    * retention count — the "eval-set corpus v1" / "paper-reproduction
    * state" use case where a 100 TB table's audit point must survive
    * routine GC at zero storage cost beyond the shared files.
    */
  def tagVersion(s: SparkSession, table: String, name: String,
      version: Int): Unit = {
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
        c == '-' || c == '_' || c == '.'),
      s"tagVersion: bad tag name '$name' (letters/digits/-_. only)")
    require(version >= 1 && version <= latestVersion(s, table),
      s"tagVersion: v$version not committed at $table")
    val f = fs(s, table)
    require(publishExclusive(s, f, new Path(s"$table/tag-$name.txt"),
        version.toString),
      s"tagVersion: tag '$name' already exists at $table (immutable — " +
        "dropTag first to move it)")
  }

  /** Resolve a tag to its version; loud when absent. */
  def resolveTag(s: SparkSession, table: String, name: String): Int = {
    val f = fs(s, table)
    val p = new Path(s"$table/tag-$name.txt")
    require(f.exists(p), s"no tag '$name' at $table")
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.trim.toInt
  }

  def dropTag(s: SparkSession, table: String, name: String): Unit =
    fs(s, table).delete(new Path(s"$table/tag-$name.txt"), false): Unit

  /** Every live tag, name → version. */
  def tagsOf(s: SparkSession, table: String): Map[String, Int] = {
    val f = fs(s, table)
    val st = f.globStatus(new Path(s"$table/tag-*.txt"))
    if (st == null) Map.empty
    else st.map { m =>
      val name = m.getPath.getName.stripPrefix("tag-").stripSuffix(".txt")
      name -> resolveTag(s, table, name)
    }.toMap
  }

  /** MULTI-TABLE SAVEPOINT: one name tags EVERY listed table's current
    * version, so a cross-table computation (the reporting join, the
    * training-run input set) can be re-resolved later exactly as it
    * was — each table read at `resolveTag(name)` — and [[vacuum]] pins
    * all of them. Claims happen per table in order: each table's tag
    * is exact for that table, but a writer landing BETWEEN claims
    * makes the savepoint fuzzy ACROSS tables (the standard caveat of
    * any lakehouse without multi-table transactions — quiesce writers
    * or check the returned versions if cross-table atomicity matters).
    * A failed claim rolls back the tags already taken.
    *
    * @return table → version captured
    */
  def savepoint(s: SparkSession, tables: Seq[String],
      name: String): Map[String, Int] = {
    require(tables.nonEmpty, "savepoint: no tables")
    val claimed = scala.collection.mutable.ListBuffer[String]()
    try {
      tables.map { t =>
        val v = latestVersion(s, t)
        tagVersion(s, t, name, v)
        claimed += t
        t -> v
      }.toMap
    } catch {
      case e: Throwable =>
        claimed.foreach(t => dropTag(s, t, name))
        throw e
    }
  }

  /** Read `table` as of the named savepoint/tag. */
  def readAt(s: SparkSession, table: String, name: String): DataFrame =
    read(s, table, Some(resolveTag(s, table, name)))

  /** WRITE–AUDIT–PUBLISH, stage step (the Iceberg WAP pattern): the
    * batch's data lands under its own directory and a `staged-<id>.txt`
    * marker OUTSIDE the manifest chain — readers of the table see
    * NOTHING, the audit sees everything via [[readStaged]], and only
    * [[publishStaged]] makes the batch a version. The quality gate
    * moves BEFORE visibility: a failed audit [[abandonStaged]]s at zero
    * blast radius (no version ever existed to roll back), which at
    * 100 TB is the difference between "the bad batch never happened"
    * and a revert-commit scramble while downstream syncs already read
    * it. Schema is validated at stage time (fail fast) AND re-validated
    * by the publish CAS. [[vacuum]] treats marker-referenced dirs as
    * live, so a long audit can outlast the orphan grace window.
    *
    * @return the stage id to audit/publish/abandon by
    */
  def commitStaged(df: DataFrame, table: String): String = {
    val s = df.sparkSession
    checkSchema(s, table, df, allowEvolve = false)
    val id = java.util.UUID.randomUUID().toString.take(13)
    val dir = s"data/c-$id"
    df.write.mode("errorifexists").parquet(s"$table/$dir")
    val f = fs(s, table)
    atomicWrite(s, f, new Path(s"$table/staged-$id.txt"),
      dir + "\n#schema " + df.schema.toDDL + "\n")
    id
  }

  /** The AUDIT view of a staged batch: current table state (if any)
    * plus the staged rows — what the table WOULD look like after
    * publish, without publishing. Run the expectation suite here.
    */
  def readStaged(s: SparkSession, table: String, stageId: String): DataFrame = {
    val f = fs(s, table)
    require(f.exists(new Path(s"$table/staged-$stageId.txt")),
      s"no staged batch $stageId at $table")
    val staged = s.read.parquet(s"$table/data/c-$stageId")
    if (latestVersion(s, table) < 1) staged
    else read(s, table).unionByName(staged, allowMissingColumns = true)
  }

  /** PUBLISH a staged batch — the ordinary append CAS over the already-
    * written directory (schema re-validated per attempt; the marker is
    * removed after the claim). @return the new version */
  def publishStaged(s: SparkSession, table: String, stageId: String,
      maxAttempts: Int = 50): Int = {
    val f = fs(s, table)
    val marker = new Path(s"$table/staged-$stageId.txt")
    require(f.exists(marker), s"no staged batch $stageId at $table")
    val dir = s"data/c-$stageId"
    val df = s.read.parquet(s"$table/$dir")
    // validate the STAGE-TIME schema recorded in the marker, not the
    // parquet read-back (which loosens NOT NULL to nullable — the same
    // drift-guard trap the maintenance paths sidestep via the carried
    // #schema line)
    val stagedDdl = {
      val in = f.open(marker)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.find(_.startsWith("#schema "))
        .map(_.stripPrefix("#schema "))
        .getOrElse(sys.error(s"publishStaged: marker $stageId carries no schema"))
    }
    val stagedSchema = org.apache.spark.sql.types.StructType.fromDDL(stagedDdl)
    // footers of an immutable staged dir — count once, not per attempt
    val stagedRowsLine =
      s"#dirrows $dir ${footerRowCount(f, new Path(s"$table/$dir"))}"
    var validatedChecks: Option[Set[(String, String)]] = None
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      checkSchemaOf(s, table, stagedSchema, allowEvolve = false)
      val prevLines = if (prev == 0) Nil else manifestLines(s, table, prev)
      // CHECK constraints gate the PUBLISH, not the stage: the WAP
      // audit can stage and inspect exactly what publish would refuse
      // ([[readStaged]] sees it, the chain never does) — validated once
      // per constraint set, pre-claim
      val prevChecks = checkLinesOf(prevLines)
      if (!validatedChecks.contains(prevChecks.toSet)) {
        requireChecks(df, prevChecks, table, "publishStaged")
        validatedChecks = Some(prevChecks.toSet)
      }
      // empty table: record the STAGE-TIME contract, not the parquet
      // read-back DDL (NOT NULL loosened to nullable — a later commit
      // of the original non-nullable schema would refuse as drift)
      val prevDdl = (if (prev >= 1) schemaOf(s, table, prev) else None)
        .getOrElse(stagedDdl)
      val header = (prevLines.filter(_.startsWith("#txn ")) ++
        Seq(s"#schema $prevDdl") ++
        prevLines.filter(l => l.startsWith("#dirstats ") ||
          l.startsWith("#dirstatsS ") || l.startsWith("#dirbloom ") ||
          l.startsWith("#dirrows ")) ++
        Seq(stagedRowsLine) ++
        prevLines.filter(_.startsWith("#dv ")) ++
        prevLines.filter(_.startsWith("#rename ")) ++
        prevLines.filter(_.startsWith("#spec ")) ++
        prevLines.filter(_.startsWith("#check ")) ++
        Seq("#change append")).map(_ + "\n").mkString
      val dirs = prevLines.filterNot(_.startsWith("#")) :+ dir
      val v = prev + 1
      if (publishExclusive(s, f, manifestPath(table, v),
          header + dirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        f.delete(marker, false): Unit
        return v
      }
      attempt += 1
    }
    sys.error(s"publishStaged on $table lost the version race $maxAttempts times")
  }

  /** ABANDON a staged batch: data dir + marker removed, the chain never
    * knew it existed. */
  def abandonStaged(s: SparkSession, table: String, stageId: String): Unit = {
    val f = fs(s, table)
    f.delete(new Path(s"$table/data/c-$stageId"), true): Unit
    f.delete(new Path(s"$table/staged-$stageId.txt"), false): Unit
  }

  /** OPTIMIZE … ZORDER BY — layout-aware compaction as one snapshot
    * commit (the Delta `OPTIMIZE ZORDER BY` / Iceberg sort-order
    * rewrite): EVERY current data directory rewrites into `nChunks`
    * FIXED Morton-range chunks (`[i·2^(d·bits)/nChunks, (i+1)·…)` — the
    * deterministic io24 layout, not a sampled range partitioning), each
    * chunk its own directory with fresh multi-column `#dirstats`, so a
    * post-optimize range query prunes on TIGHT per-dir hyper-rectangles
    * where the pre-optimize append order admitted every directory.
    *
    * One data pass writes all chunks (dynamic `partitionBy` on the
    * chunk id into a staging dir, then per-chunk metadata renames into
    * `data/`), one aggregate computes all chunks' stats; rows are
    * UNCHANGED (dv tombstones carry and keep suppressing; the rename
    * mapping normalizes as in [[compactSmall]]), so the version is
    * `#change compact` — [[changeFeed]] emits nothing for it. CAS
    * posture identical to [[deleteWhere]]: lost race ⇒ abandon chunks,
    * recompute against the new chain.
    *
    * @param zCols non-negative integral columns, each below
    *              `2^bitsPerDim` (the [[graft.ops.Layout.zValue]]
    *              contract)
    * @return (new version, number of chunk directories written)
    */
  def optimizeClustered(s: SparkSession, table: String, zCols: Seq[String],
      bitsPerDim: Int, nChunks: Int, maxAttempts: Int = 50): (Int, Int) = {
    import org.apache.spark.sql.functions.{col, count, floor, lit, max, min}
    require(zCols.nonEmpty, "optimizeClustered: no cluster columns")
    require(nChunks >= 1 && bitsPerDim >= 1 && zCols.size * bitsPerDim < 63,
      s"optimizeClustered: bad layout params ($bitsPerDim bits × " +
        s"${zCols.size} dims, $nChunks chunks)")
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val lines = manifestLines(s, table, prev)
      val dirs = lines.filterNot(_.startsWith("#"))
      val df = applyRenames(lines, readDirsRaw(s, table, lines, dirs))
      // fail fast BEFORE the rewrite: a NULL in any z-column would
      // yield a null __chunk (a __HIVE_DEFAULT_PARTITION__ dir and an
      // NPE in the stats pass AFTER the full table rewrite) — the
      // zValue contract is non-null, enforced loudly up front
      val nullRow = df.agg(count(lit(1)).as("__all"),
        zCols.map(c => count(col(c)).as(s"__nn_$c")): _*).head()
      val total = nullRow.getLong(0)
      zCols.zipWithIndex.foreach { case (c, i) =>
        require(nullRow.getLong(i + 1) == total,
          s"optimizeClustered: z-column '$c' at $table has " +
            s"${total - nullRow.getLong(i + 1)} NULL row(s) — the " +
            "zValue contract requires non-null integral values")
      }
      val zMax = 1L << (zCols.size * bitsPerDim)
      val width = math.max(1L, zMax / nChunks)
      // `div` for EXACT integral chunking (a double `/` would lose
      // precision past 2^53 — Morton codes go to 2^62 here)
      val z = df.withColumn("__z",
          graft.ops.Layout.zValue(zCols.map(col), bitsPerDim))
        .withColumn("__chunk",
          org.apache.spark.sql.functions.expr(s"__z div ${width}L"))
        .drop("__z")
      val stage = s"$table/.opt-${java.util.UUID.randomUUID().toString.take(13)}"
      z.write.mode("errorifexists").partitionBy("__chunk").parquet(stage)
      // per-chunk bounds in ONE aggregate (chunk ranges are disjoint by
      // construction, so per-dir min/max is tight without intra-sort)
      val statRows = z.groupBy(col("__chunk"))
        .agg(count(lit(1)).as("__n"),
          zCols.flatMap(c => Seq(min(col(c).cast("long")).as(s"__mn_$c"),
            max(col(c).cast("long")).as(s"__mx_$c"))): _*)
        .collect()
      // metadata renames: each staged chunk becomes a first-class dir
      val chunkDirs = statRows.map { r =>
        val cid = r.getLong(0)
        val d = s"data/c-${java.util.UUID.randomUUID().toString.take(13)}"
        require(f.rename(new Path(s"$stage/__chunk=$cid"),
            new Path(s"$table/$d")),
          s"optimizeClustered: staging rename failed for chunk $cid")
        (d, r)
      }
      f.delete(new Path(stage), true): Unit
      val newStats = chunkDirs.flatMap { case (d, r) =>
        zCols.zipWithIndex.flatMap { case (c, i) =>
          if (r.isNullAt(2 + 2 * i)) None
          // z-columns are contract-enforced non-null → the 5th token
          // (non-null count) is the chunk's row count, no extra pass
          else Some(s"#dirstats $d $c ${r.getLong(2 + 2 * i)} " +
            s"${r.getLong(3 + 2 * i)} ${r.getLong(1)}")
        }
      } ++
        // per-chunk row counts ride the same aggregate — no footer reads
        chunkDirs.map { case (d, r) => s"#dirrows $d ${r.getLong(1)}" }
      val ddl = schemaOf(s, table, prev).getOrElse(df.schema.toDDL)
      val header = maintenanceHeader(s, table, prev, ddl, Set.empty,
        changeKind = "compact") + newStats.map(_ + "\n").mkString
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v),
          header + chunkDirs.map(_._1).mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return (v, chunkDirs.length)
      }
      chunkDirs.foreach { case (d, _) =>
        f.delete(new Path(s"$table/$d"), true): Unit
      }
      attempt += 1
    }
    sys.error(s"optimizeClustered on $table lost the race $maxAttempts times")
  }

  /** RENAME WITHOUT REWRITE — logical column rename as a metadata-only
    * commit (the Delta column-mapping / Iceberg `RENAME COLUMN` move):
    * the new manifest carries the SAME data directories, a re-written
    * `#schema` contract, `#dirstats` lines re-keyed to the new name
    * (pruning keeps working), and a `#rename old new` mapping line that
    * every read path folds over raw parquet — pre-rename directories
    * keep their old physical names forever (no 100 TB rewrite), new
    * commits write the new name natively, and `mergeSchema` reads
    * across the mix coalesce into ONE column under the new name.
    * Maintenance rewrites normalize as a side effect, and the mapping
    * line still carries (a no-op once no old-named directory remains).
    *
    * Guard rails: the target name must be free in the current schema;
    * the dv KEY column cannot rename while `#dv` lines exist
    * (materialize first — tombstone files hold the old physical name);
    * and [[commit]] refuses to re-introduce a renamed-away name (the
    * mapping would silently swallow the new column). Time travel is
    * contract-accurate: pre-rename versions read under the old name.
    * CAS posture identical to [[commit]].
    *
    * @return the new version
    */
  def renameColumn(s: SparkSession, table: String, oldName: String,
      newName: String, maxAttempts: Int = 50): Int = {
    require(oldName != newName, s"renameColumn: $oldName -> itself")
    require(!oldName.contains(" ") && !newName.contains(" ") &&
        oldName.nonEmpty && newName.nonEmpty,
      "renameColumn: names must be non-empty and space-free " +
        "(the manifest line format is space-delimited)")
    val f = fs(s, table)
    var attempt = 0
    while (attempt < maxAttempts) {
      val prev = latestVersion(s, table)
      require(prev >= 1, s"nothing committed at $table")
      val lines = manifestLines(s, table, prev)
      val ddl = lines.find(_.startsWith("#schema "))
        .map(_.stripPrefix("#schema ")).getOrElse(sys.error(
          s"renameColumn: $table carries no #schema contract"))
      val st = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      require(st.fieldNames.contains(oldName),
        s"renameColumn: no column '$oldName' at $table (schema: $ddl)")
      require(!st.fieldNames.contains(newName),
        s"renameColumn: '$newName' already exists at $table")
      require(!dvLinesOf(lines).exists(_._2 == oldName),
        s"renameColumn: '$oldName' is the live deletion-vector key at " +
          s"$table — materializeDeletes first (tombstone files hold the " +
          "old physical name)")
      // a live partition column cannot rename: #spec dirs encode the
      // old physical name in their PATHS (=col/value directories) —
      // compact those dirs to flat first, then rename
      require(!specLinesOf(lines).values.exists(_.contains(oldName)),
        s"renameColumn: '$oldName' is a live partition column at " +
          s"$table — compactSmall the partitioned directories first " +
          "(their paths encode the old physical name)")
      // a CHECK expression referencing the old name would stop
      // resolving at the next commit — refuse; drop/re-add the
      // constraint around the rename explicitly
      val refed = checkLinesOf(lines).filter { case (_, e) =>
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(e).collect {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              a.name
          }.exists(_.equalsIgnoreCase(oldName))
      }
      require(refed.isEmpty,
        s"renameColumn: CHECK constraint(s) ${refed.map(_._1).mkString(", ")} " +
          s"reference '$oldName' at $table — dropCheck, rename, then " +
          "addCheck under the new name")
      val newSt = org.apache.spark.sql.types.StructType(st.map(fld =>
        if (fld.name == oldName) fld.copy(name = newName) else fld))
      val stats = lines.filter(l =>
          l.startsWith("#dirstats ") || l.startsWith("#dirstatsS ")).map { l =>
        val kind = l.split(" ")(0)
        val p = l.stripPrefix(kind + " ").split(" ")
        // re-key the column token only — the value tail (bounds, and
        // the r16 non-null count on 5-token #dirstats lines) carries
        if (p(1) == oldName)
          (Seq(kind, p(0), newName) ++ p.drop(2)).mkString(" ")
        else l
      } ++
        // sidecar sketches survive the rename too — the sketch hashes
        // VALUES, not names, so re-keying the column token keeps every
        // membership answer valid under the new contract
        lines.filter(_.startsWith("#dirbloom ")).map { l =>
          val p = l.split(" ") // #dirbloom <dir> <col> <sidecar>
          if (p(2) == oldName) s"#dirbloom ${p(1)} $newName ${p(3)}" else l
        }
      val header = (lines.filter(_.startsWith("#txn ")) ++
        Seq(s"#schema ${newSt.toDDL}") ++ stats ++
        // row counts carry VERBATIM — no column token to re-key
        lines.filter(_.startsWith("#dirrows ")) ++
        lines.filter(_.startsWith("#dv ")) ++
        lines.filter(_.startsWith("#rename ")) ++
        lines.filter(_.startsWith("#spec ")) ++
        lines.filter(_.startsWith("#check ")) ++
        Seq(s"#rename $oldName $newName", "#change rename"))
        .map(_ + "\n").mkString
      val dirs = lines.filterNot(_.startsWith("#"))
      val v = prev + 1
      if (latestVersion(s, table) == prev && publishExclusive(s, f,
          manifestPath(table, v), header + dirs.mkString("\n"))) {
        try {
          if (v > latestHintOnly(s, table))
            atomicWrite(s, f, new Path(s"$table/_latest"), v.toString)
        } catch { case _: java.io.IOException => () }
        return v
      }
      attempt += 1
    }
    sys.error(s"renameColumn on $table lost the version race $maxAttempts times")
  }

  /** Raised when a change-feed range needs a manifest that [[vacuum]]
    * already expired — the consumer's cursor fell behind the source's
    * retention horizon, and silently skipping the gap would drop its
    * deltas (the Delta `startingVersion`-out-of-retention contract).
    * Recovery is a RE-BOOTSTRAP: full snapshot load at the current
    * version, cursor reset there, then incremental syncs resume —
    * exactly what [[graft.streaming.ChangeFeedSync.replicateOnce]] does
    * for an empty replica.
    */
  final class OutOfRetentionException(val table: String, val requested: Int,
      val firstAvailable: Int) extends RuntimeException(
    s"change feed at $table: version $requested is out of retention — " +
      s"the earliest feedable version is $firstAvailable; re-bootstrap " +
      "the consumer (full snapshot load at the current version, then " +
      "resume incrementally from there)")

  /** The smallest version a [[changeFeed]] range may START at after
    * vacuuming: the oldest RETAINED manifest + 1 (an `append` or
    * `mor-delete` at version v consults v−1's manifest to diff against;
    * only an unvacuumed chain can feed from 1). Conservative — a
    * sidecar-only version at the horizon would be readable, but
    * promising it would make the contract depend on the change kind.
    */
  def earliestFeedable(s: SparkSession, table: String): Int = {
    val f = fs(s, table)
    val listed = f.globStatus(new Path(s"$table/manifest-v*.txt")) match {
      case null => Nil
      case sts => sts.map(_.getPath.getName
        .stripPrefix("manifest-v").stripSuffix(".txt").toInt).toSeq
    }
    if (listed.isEmpty) 1
    else if (listed.min == 1) 1
    else listed.min + 1
  }

  /** The `#change` provenance kind at `version` (`append`, `merge`,
    * `mor-delete`, `delete-cow`, `compact`, `materialize`, `rename`,
    * `constraint`) — one manifest read. A vacuum-expired manifest
    * raises the typed [[OutOfRetentionException]] (the streaming
    * sources classify versions by kind; a silent gap would drop
    * deltas). Loud on a pre-provenance manifest, like [[changeFeed]].
    */
  def changeKindOf(s: SparkSession, table: String, version: Int): String = {
    val lines =
      try manifestLines(s, table, version)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new OutOfRetentionException(table, version,
            earliestFeedable(s, table))
      }
    lines.find(_.startsWith("#change "))
      .map(_.stripPrefix("#change ")).getOrElse(sys.error(
        s"changeKindOf: $table v$version carries no #change provenance"))
  }

  /** CHANGE DATA FEED — the row-level delta between two versions,
    * emitted as `(data columns…, _change_type, _commit_version)` with
    * `_change_type ∈ {insert, delete}` (the Delta CDF / Iceberg
    * changelog-scan surface). This is what turns the lakehouse into an
    * incremental SOURCE: a downstream consumer folds the feed instead
    * of re-reading the table, so maintaining a 100 TB table's derived
    * aggregates costs O(changed rows) per sync, not O(table) — the
    * batch-side twin of the Z-set streams in `ops.Cdc`.
    *
    * Per-version provenance comes from the `#change` manifest line each
    * writer records, so the feed never DIFFS two table versions (an
    * O(table) anti-join); the cost model per version kind:
    *  - `append` — reads ONLY the directories new in that version
    *    (minus keys a live dv tombstone suppresses: those rows were
    *    never visible, so they never entered the feed);
    *  - `delete-cow` — reads ONLY the `#cdf` sidecar the delete wrote
    *    (O(deleted rows), captured at delete time);
    *  - `mor-delete` — the one kind that pays a preimage scan: dv
    *    commits write O(keys), so the deleted ROWS are recovered here
    *    by one broadcast-eligible semi-join of the prior version
    *    against the new dv keys (the same trade Delta makes for
    *    DV-only commits: cheap write, feed-read pays);
    *  - `compact` / `materialize` — emit NOTHING: maintenance moves
    *    bytes, never rows, and a feed that re-emitted a compaction
    *    would double every folded row downstream.
    *
    * Folding `insert − delete` over versions `1..v` reconstructs
    * `read(v)` exactly (spec-gated). A version without a `#change`
    * line (written by a pre-provenance build) fails LOUDLY — guessing
    * a kind could silently double or drop rows downstream.
    *
    * @param fromV first version whose changes to emit (inclusive, ≥ 1)
    * @param toV   last version (inclusive)
    */
  def changeFeed(s: SparkSession, table: String,
      fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromV >= 1 && toV >= fromV,
      s"changeFeed: bad version range [$fromV, $toV]")
    require(toV <= latestVersion(s, table),
      s"changeFeed: v$toV not committed at $table")
    // a manifest the range needs that [[vacuum]] already expired is a
    // TYPED refusal, not a raw FileNotFound: the consumer's cursor fell
    // behind the retention horizon and must re-bootstrap (the Delta
    // "startingVersion out of retention" contract)
    def mfOr(v: Int): Seq[String] =
      try manifestLines(s, table, v)
      catch {
        case _: java.io.FileNotFoundException =>
          throw new OutOfRetentionException(table, fromV,
            earliestFeedable(s, table))
      }
    // every emitted part folds to toV's column contract, so a feed
    // spanning a rename stays one well-typed frame
    val mapLines = mfOr(toV)
    val parts: Seq[DataFrame] = (fromV to toV).flatMap { v =>
      val lines = mfOr(v)
      val kind = lines.find(_.startsWith("#change "))
        .map(_.stripPrefix("#change ")).getOrElse(sys.error(
          s"changeFeed: $table v$v carries no #change provenance — " +
            "feed reads are defined only over change-tracking commits"))
      // LAZY: only `append` and `mor-delete` consult the prior
      // manifest — `delete-cow` reads just its sidecar, so a feed over
      // post-vacuum versions works even when v-1's manifest expired
      // (the Delta rule: CDF range bounded by retention only where the
      // kind actually needs history)
      lazy val prevLines =
        if (v == 1) Nil else mfOr(v - 1)
      val vParts: Seq[DataFrame] = kind match {
        case "append" =>
          val prevDirs = prevLines.filterNot(_.startsWith("#")).toSet
          val newDirs = lines.filterNot(_.startsWith("#"))
            .filterNot(prevDirs)
          if (newDirs.isEmpty) Nil
          else {
            // dv FIRST, on the raw read: dv key files hold the physical
            // key name of their era (renameColumn refuses while #dv
            // lines are live, so version-v dirs share it), and toV's
            // rename mapping may have since retired that name — folding
            // renames first would leave the anti-join unresolvable
            val raw = readDirsRaw(s, table, lines, newDirs)
            Seq(applyRenames(mapLines,
                applyDv(s, table, dvLinesOf(lines), raw))
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(v)))
          }
        case "mor-delete" =>
          val newDvs = dvLinesOf(lines).toSet -- dvLinesOf(prevLines).toSet
          if (newDvs.isEmpty) Nil
          else {
            val keyCols = newDvs.map(_._2).toSeq.distinct
            require(keyCols.size == 1,
              s"changeFeed: mixed dv key columns at $table v$v: $keyCols")
            val keys = s.read
              .parquet(newDvs.map(t => resolveDirPath(table, t._1)).toSeq: _*)
              .distinct()
            Seq(applyRenames(mapLines, read(s, table, Some(v - 1))
                .join(keys, Seq(keyCols.head), "left_semi"))
              .withColumn("_change_type", lit("delete"))
              .withColumn("_commit_version", lit(v)))
          }
        case "delete-cow" =>
          val cdfDirs = lines.filter(_.startsWith("#cdf "))
            .map(_.stripPrefix("#cdf "))
          if (cdfDirs.isEmpty) Nil
          // readDirsRaw for the sidecars too: they inherit its
          // committed-#schema fallback (a sidecar CAN hold zero files —
          // e.g. every doomed row was already dv-hidden)
          else Seq(applyRenames(mapLines, readDirsRaw(s, table, lines, cdfDirs))
            .withColumn("_change_type", lit("delete"))
            .withColumn("_commit_version", lit(v)))
        case "merge" =>
          // delete(preimage) from the #cdfdel sidecar, insert(postimage)
          // from the #cdfins pointer (the merge's source directory) —
          // both O(changed rows), unchanged survivors never emitted
          def side(tag: String, change: String): Seq[DataFrame] = {
            val ds = lines.filter(_.startsWith(s"#$tag "))
              .map(_.stripPrefix(s"#$tag "))
            if (ds.isEmpty) Nil
            else Seq(applyRenames(mapLines, readDirsRaw(s, table, lines, ds))
              .withColumn("_change_type", lit(change))
              .withColumn("_commit_version", lit(v)))
          }
          side("cdfdel", "delete") ++ side("cdfins", "insert")
        case "compact" | "materialize" | "rename" | "constraint" => Nil
        case other => sys.error(
          s"changeFeed: unknown #change kind '$other' at $table v$v")
      }
      // commit-level lineage rides every row of its version's changes:
      // the sorted `k=v` props the writer recorded ("" when none) —
      // a consumer can filter a feed by pipeline run / source batch
      // without joining a side table
      val propsStr = propsRendered(linesProps(lines))
      vParts.map(_.withColumn("_commit_props", lit(propsStr)))
    }
    parts match {
      case Seq() => read(s, table, Some(toV)).filter(lit(false))
        .withColumn("_change_type", lit(""))
        .withColumn("_commit_version", lit(0))
        .withColumn("_commit_props", lit(""))
      case head +: tail => tail.foldLeft(head)(
        _.unionByName(_, allowMissingColumns = true))
    }
  }

  private def linesProps(lines: Seq[String]): Map[String, String] =
    lines.filter(_.startsWith("#prop "))
      .map(_.stripPrefix("#prop ").split(" ")).collect {
        case Array(k, v) => dec(k) -> dec(v)
      }.toMap

  private def propsRendered(props: Map[String, String]): String =
    props.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")

  /** COMMIT-LEVEL USER PROPERTIES of a version — the `k → v` lineage
    * the writer passed to [[commit]]/[[commitIfAbsent]]/
    * [[commitPartitioned]] (`pipeline=…`, `source_batch=…`,
    * `operator=…`). PER-VERSION, like `#change`: properties describe
    * the commit that recorded them and never carry forward.
    */
  def propsOf(s: SparkSession, table: String, version: Int): Map[String, String] =
    linesProps(manifestLines(s, table, version))

  /** TABLE HISTORY — one row per still-resolvable version: `(version,
    * change, n_dirs, props)` with `props` the sorted `k=v;…` rendering
    * of the commit's user properties (the Delta `DESCRIBE HISTORY`
    * surface). Vacuumed versions are absent, not errors. Cost: one
    * manifest read per version — metadata scale.
    */
  def tableHistory(s: SparkSession, table: String): DataFrame = {
    val latest = latestVersion(s, table)
    val rows = (1 to latest).flatMap { v =>
      try {
        val lines = manifestLines(s, table, v)
        val kind = lines.find(_.startsWith("#change "))
          .map(_.stripPrefix("#change ")).getOrElse("")
        Some(org.apache.spark.sql.Row(v, kind,
          lines.count(!_.startsWith("#")).toLong,
          propsRendered(linesProps(lines))))
      } catch { case _: java.io.FileNotFoundException => None }
    }
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
      StructField, StructType}
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("version", IntegerType),
        StructField("change", StringType),
        StructField("n_dirs", LongType),
        StructField("props", StringType))))
  }
}
