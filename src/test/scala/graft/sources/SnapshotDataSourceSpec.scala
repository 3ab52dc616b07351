package graft.sources

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

class SnapshotDataSourceSpec extends SparkSpec {

  private def freshBase(): String = {
    val t = s"/tmp/graft_io/snapdsv2/${java.util.UUID.randomUUID()}"
    new java.io.File(t).mkdirs()
    t
  }

  private def bitEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean = {
    val x = a.localCheckpoint()
    val y = b.localCheckpoint()
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  test("format read == library read bit-for-bit on a table with " +
      "stats, bloom, rename, MoR delete, and additive evolution") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    Snapshots.commitWithBloom(
      (1L to 40L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    Snapshots.commitWithStats(
      (41L to 80L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    Snapshots.renameColumn(spark, t, "v", "w")
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 7 === 0)
    Snapshots.commit(
      (81L to 90L).map(k => (k, k * 10L, s"s$k")).toDF("k", "w", "tag"),
      t, allowEvolve = true)
    val lib = Snapshots.read(spark, t).select("k", "w", "tag")
    val fmt = spark.read.format("graft-snapshot").option("path", t)
      .load().select("k", "w", "tag")
    assert(fmt.schema.fieldNames.toSeq == Seq("k", "w", "tag"))
    assert(bitEqual(lib, fmt),
      "the format read must equal the library read bit-for-bit")
    // time travel by option: v1 predates the rename — contract-accurate
    val v1 = spark.read.format("graft-snapshot").option("path", t)
      .option("versionAsOf", "1").load()
    assert(v1.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(bitEqual(v1, Snapshots.read(spark, t, Some(1))))
  }

  test("version pinning: a loaded frame keeps its snapshot across " +
      "later commits; tag and timestamp options resolve") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), t)
    val before = System.currentTimeMillis()
    val pinned = spark.read.format("graft-snapshot").option("path", t).load()
    Snapshots.tagVersion(spark, t, "first", 1)
    Thread.sleep(30)
    Snapshots.commit((11L to 20L).map(k => (k, k)).toDF("k", "v"), t)
    assert(pinned.count() == 10,
      "a resolved frame must keep reading its pinned version")
    val tagged = spark.read.format("graft-snapshot").option("path", t)
      .option("tag", "first").load()
    assert(tagged.count() == 10)
    val asOf = spark.read.format("graft-snapshot").option("path", t)
      .option("timestampAsOf", before.toString).load()
    assert(asOf.count() == 10,
      "timestampAsOf between the commits must resolve v1")
    assert(spark.read.format("graft-snapshot").option("path", t)
      .load().count() == 20)
    // conflicting pins refuse
    val e = intercept[IllegalArgumentException](
      spark.read.format("graft-snapshot").option("path", t)
        .option("versionAsOf", "1").option("tag", "first").load())
    assert(e.getMessage.contains("at most one"))
  }

  test("SQL catalog: SELECT with VERSION AS OF <int>, VERSION AS OF " +
      "'<tag>', TIMESTAMP AS OF, and the head read all plan through " +
      "the manifests; DDL refuses loudly") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/events"
    Snapshots.commit((1L to 15L).map(k => (k, k * 2L)).toDF("k", "v"), t)
    Snapshots.tagVersion(spark, t, "eval-v1", 1)
    Thread.sleep(30)
    val mid = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(30)
    Snapshots.commit((16L to 25L).map(k => (k, k * 2L)).toDF("k", "v"), t)
    val cat = s"snapspec_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $cat.events")
      .head().getLong(0) == (1L to 25L).map(_ * 2L).sum)
    assert(spark.sql(
        s"SELECT count(*) AS n FROM $cat.events VERSION AS OF 1")
      .head().getLong(0) == 15)
    assert(spark.sql(
        s"SELECT count(*) AS n FROM $cat.events VERSION AS OF 'eval-v1'")
      .head().getLong(0) == 15)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.events " +
        s"TIMESTAMP AS OF '$mid'").head().getLong(0) == 15)
    // a library write lands and the NEXT SQL read sees it (no caching
    // beyond the per-query load)
    Snapshots.commit(Seq((99L, 0L)).toDF("k", "v"), t)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.events")
      .head().getLong(0) == 26)
    val ddl = intercept[UnsupportedOperationException](
      spark.sql(s"DROP TABLE $cat.events"))
    assert(ddl.getMessage.contains("read-only"))
    // unknown table → the standard analyzer error, not a stack trace
    val missing = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT * FROM $cat.nope").collect())
    assert(missing.getMessage.toLowerCase.contains("nope"))
  }

  test("pushdown: an equality predicate on a bloom-sketched key prunes " +
      "directories inside SQL planning; ranges prune on dirstats; " +
      "results stay exact") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // scattered keys (ranges overlap) → only the sketch can prune
    Snapshots.commitWithBloom(
      Seq(1L, 901L, 13L, 777L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    Snapshots.commitWithBloom(
      Seq(2L, 900L, 14L, 778L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    val fmt = spark.read.format("graft-snapshot").option("path", t).load()
    val hit = fmt.filter(col("k") === 901L).select("v")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(9010L))
    val info = SnapshotScans.lastScan.get
    assert(info.dirsTotal == 2 && info.dirsRead == 1,
      s"sketch pruning must reach the DSv2 scan " +
        s"(${info.dirsRead}/${info.dirsTotal})")
    // the pushed filter shows up in the plan (the explain contract)
    val planText = hit.queryExecution.executedPlan.toString
    assert(planText.contains("PushedFilters") || planText.contains("901"),
      s"plan must surface the pushdown:\n$planText")
    // range stats pruning through the format: two disjoint-range commits
    val t2 = s"$base/t2"
    Snapshots.commitWithStats(
      (1L to 50L).map(k => (k, k)).toDF("k", "v"), t2, "k")
    Snapshots.commitWithStats(
      (51L to 100L).map(k => (k, k)).toDF("k", "v"), t2, "k")
    val r = spark.read.format("graft-snapshot").option("path", t2).load()
      .filter(col("k") >= 60L && col("k") <= 70L)
    assert(r.count() == 11)
    val info2 = SnapshotScans.lastScan.get
    assert(info2.dirsTotal == 2 && info2.dirsRead == 1,
      s"range pruning must reach the DSv2 scan " +
        s"(${info2.dirsRead}/${info2.dirsTotal})")
    // IN-list over the sketches: both members' dirs open, no more
    val inq = spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("k").isin(901L, 900L)).agg(sum("v").as("s"))
    assert(inq.head().getLong(0) == 9010L + 9000L)
    // an untranslatable predicate still answers exactly (residual-only)
    assert(spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("v") % 2 === 0).count() == 8)
  }

  test("column pruning: the required schema reaches the inner parquet " +
      "scan; count(*) over an empty required schema works") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    Snapshots.commit((1L to 30L)
      .map(k => (k, s"pad$k" * 10, k * 3L)).toDF("k", "pad", "v"), t)
    val fmt = spark.read.format("graft-snapshot").option("path", t).load()
    assert(fmt.select("k").columns.toSeq == Seq("k"))
    assert(fmt.select(sum("v")).head().getLong(0) == (1L to 30L).map(_ * 3L).sum)
    assert(fmt.count() == 30)
    // SQL aggregate over the catalog
    val cat = s"snapspec_${math.abs(t.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t")
      .head().getLong(0) == 30)
  }

  test("write path: INSERT INTO and writeTo().append() land as CAS " +
      "commits with schema and CHECK gates; pinned loads and OVERWRITE " +
      "refuse") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // nullable contract (Option) so SQL inserts compare like for like
    Snapshots.commit(Seq((Option(1L), Option(10L)), (Option(2L), Option(20L)))
      .toDF("k", "v"), t)
    Snapshots.addCheck(spark, t, "v-pos", "v > 0")
    val cat = s"snapw_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    // SQL INSERT routes through Snapshots.commit: new version, data live
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 30), (4, 40)")
    assert(Snapshots.latestVersion(spark, t) == 3)
    assert(Snapshots.read(spark, t).count() == 4)
    assert(spark.sql(s"SELECT sum(v) AS s FROM $cat.t")
      .head().getLong(0) == 100L)
    // the DataFrameWriterV2 door too
    Seq((Option(5L), Option(50L))).toDF("k", "v").writeTo(s"$cat.t").append()
    assert(Snapshots.read(spark, t).count() == 5)
    // a violating INSERT refuses PRE-CLAIM, naming the constraint
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.t VALUES (9, -1)"))
    assert(e.getMessage.contains("v-pos"),
      s"expected the CHECK refusal, got: ${e.getMessage}")
    assert(Snapshots.latestVersion(spark, t) == 4 &&
      Snapshots.read(spark, t).count() == 5)
    // INSERT OVERWRITE refuses — replacement is an explicit op (Spark
    // refuses at planning: the table declares no truncate capability)
    val ow = intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $cat.t VALUES (1, 1)"))
    assert(ow.getMessage.contains("truncate") ||
      ow.getMessage.contains("OVERWRITE"))
    // a version-pinned table refuses the write builder outright —
    // writing "into the past" would silently land at the head (the
    // catalog's loadTable(ident, version) constructs exactly this)
    val pinned = new SnapshotTable(t, 1,
      SnapshotDataSource.schemaAt(spark, t, 1), pinnedRead = true)
    assert(intercept[UnsupportedOperationException](
      pinned.newWriteBuilder(null)).getMessage.contains("pinned"))
    assert(Snapshots.read(spark, t).count() == 5)
  }

  test("a small snapshot table joins BROADCAST through the catalog: the " +
      "relation reports pruned-scan bytes instead of assume-huge") {
    import spark.implicits._
    val base = freshBase()
    val dim = s"$base/dim"
    Snapshots.commit((1L to 50L).map(k => (k, s"name$k")).toDF("k", "nm"), dim)
    val cat = s"snapbc_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val fact = (1L to 5000L).map(k => (k % 50 + 1, k)).toDF("k", "v")
    fact.createOrReplaceTempView("fact_bc")
    val q = spark.sql(
      s"SELECT f.k, count(*) AS n FROM fact_bc f JOIN $cat.dim d " +
        "ON f.k = d.k GROUP BY f.k")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small snapshot dim must broadcast:\n$plan")
    assert(q.count() == 50)
  }

  test("catalog listTables surfaces manifest-bearing directories only, " +
      "classifies by O(1) existence probes (cost independent of " +
      "retained-version count), and globs only for the degenerate " +
      "hint-less + v1-vacuumed table") {
    import spark.implicits._
    val base = freshBase()
    // alpha accumulates MANY versions — a per-table manifest glob would
    // pay for each of them; the probe pays one _latest existence check
    (1L to 6L).foreach(i =>
      Snapshots.commit(Seq((i, i)).toDF("k", "v"), s"$base/alpha"): Unit)
    Snapshots.commit(Seq((2L, 2L)).toDF("k", "v"), s"$base/beta")
    new java.io.File(s"$base/not_a_table").mkdirs()
    val cat = s"snapspec_${math.abs(base.hashCode + 1)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val probes0 = SnapshotCatalog.probeCount.get()
    val falls0 = SnapshotCatalog.globFallbackCount.get()
    val listed = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet
    assert(listed == Set("alpha", "beta"), s"got $listed")
    assert(SnapshotCatalog.probeCount.get() - probes0 == 3,
      "one classification probe per subdirectory")
    // only the probe-less NON-table pays a glob; the many-version
    // tables classify on their _latest hint alone
    assert(SnapshotCatalog.globFallbackCount.get() - falls0 == 1,
      "hint-bearing tables must never glob")
    // the degenerate case: hint lost AND v1 vacuumed — the fallback
    // glob fires for that table too and still classifies it
    Snapshots.vacuum(spark, s"$base/alpha", keepVersions = 1,
      orphanGraceMs = 0L)
    assert(new java.io.File(s"$base/alpha/_latest").delete())
    assert(!new java.io.File(s"$base/alpha/manifest-v1.txt").exists())
    val falls1 = SnapshotCatalog.globFallbackCount.get()
    val relisted = spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).toSet
    assert(relisted == Set("alpha", "beta"), s"got $relisted")
    assert(SnapshotCatalog.globFallbackCount.get() - falls1 == 2,
      "exactly the degenerate table and the non-table pay the glob")
  }

  test("temporal/decimal pushdown: timestamp, date, and decimal " +
      "predicates prune on the shared long encoding; inexact decimal " +
      "literals round direction-aware; lossy stats columns refuse") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = freshBase()
    val t = s"$base/t"
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2026-01-${i}%02d 12:00:00")
    val rows = (1 to 20).map(i => (i.toLong, day(i),
      java.sql.Date.valueOf(f"2026-01-${i}%02d"),
      new java.math.BigDecimal(f"${i * 10}%d.25")))
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("ts", TimestampType), StructField("d", DateType),
      StructField("price", DecimalType(10, 2))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4))), schema)
    Snapshots.commitWithMultiStats(df.filter(col("k") <= 10), t,
      Seq("ts", "d", "price"))
    Snapshots.commitWithMultiStats(df.filter(col("k") > 10), t,
      Seq("ts", "d", "price"))
    def fmt = spark.read.format("graft-snapshot").option("path", t).load()
    // timestamp range hits only the first slice
    assert(fmt.filter(col("ts") <= day(5)).count() == 5)
    val i1 = SnapshotScans.scanOf(t).get
    assert(i1.dirsTotal == 2 && i1.dirsRead == 1,
      s"timestamp bound must prune (${i1.dirsRead}/2)")
    // date equality hits only the second slice
    assert(fmt.filter(col("d") === java.sql.Date.valueOf("2026-01-15"))
      .count() == 1)
    assert(SnapshotScans.scanOf(t).get.dirsRead == 1)
    // decimal bound at the column's scale hits only the first slice
    assert(fmt.filter(col("price") <=
      new java.math.BigDecimal("100.25")).count() == 10)
    assert(SnapshotScans.scanOf(t).get.dirsRead == 1)
    // translate: inexact decimal literals round DIRECTION-AWARE
    val sc = StructType(Seq(StructField("price", DecimalType(10, 2))))
    def one(f: org.apache.spark.sql.sources.Filter) =
      SnapshotDataSource.translate(f, sc)
    assert(one(org.apache.spark.sql.sources.GreaterThan("price",
        new java.math.BigDecimal("1.234"))) ==
      Seq(Snapshots.RangeLongPred("price", Some(124L), None)),
      "lower bound takes the ceiling on the scale-2 grid")
    assert(one(org.apache.spark.sql.sources.LessThan("price",
        new java.math.BigDecimal("1.234"))) ==
      Seq(Snapshots.RangeLongPred("price", None, Some(123L))),
      "upper bound takes the floor on the scale-2 grid")
    assert(one(org.apache.spark.sql.sources.EqualTo("price",
        new java.math.BigDecimal("1.234"))).isEmpty,
      "an equality off the grid translates to nothing (residual answers)")
    assert(one(org.apache.spark.sql.sources.EqualTo("price",
        new java.math.BigDecimal("1.23"))) ==
      Seq(Snapshots.EqLongPred("price", 123L)))
    // a lossy stats declaration refuses LOUDLY at commit, pre-write
    val e = intercept[IllegalArgumentException](
      Snapshots.commitWithStats(
        Seq((1L, 1.5d)).toDF("k", "x"), s"$base/bad", "x"))
    assert(e.getMessage.contains("no exact order-preserving"),
      e.getMessage)
    assert(!new java.io.File(s"$base/bad/data").exists(),
      "the refusal must land before any data write")
  }

  test("metadata-only aggregates: count(*) answers from #dirrows and " +
      "min/max from #dirstats without opening a data file; dv-live " +
      "tables and rewritten dirs fall back to a scan, exactly") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    Snapshots.commitWithStats(
      (1L to 40L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    Snapshots.commitWithStats(
      (41L to 90L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    def fmt = spark.read.format("graft-snapshot").option("path", t).load()
    // count(*): one manifest read, zero parquet files
    assert(fmt.count() == 90)
    val i1 = SnapshotScans.scanOf(t).get
    assert(i1.dirsRead == 0 && i1.pushed.exists(_.startsWith("agg:")),
      s"count(*) must answer from the manifest ($i1)")
    // min/max on the stats column, mixed with count in one aggregate
    val r = fmt.agg(min("k").as("a"), max("k").as("b"),
      count(lit(1)).as("c")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 90L, 90L)))
    assert(SnapshotScans.scanOf(t).get.dirsRead == 0)
    // min/max on a column WITHOUT stats coverage falls back to a scan
    assert(fmt.agg(max("v")).head().getLong(0) == 900L)
    assert(SnapshotScans.scanOf(t).get.dirsRead == 2,
      "an uncovered column must fall back to the ordinary scan")
    // count(col) answers from the 5-token non-null counts — exact on a
    // null-bearing column, zero files opened
    val tc = s"$base/tc"
    Snapshots.commitWithStats(
      (1L to 20L).map(j => (if (j % 4 == 0) None else Some(j), j))
        .toDF("k", "v"), tc, "k")
    Snapshots.commitWithStats(
      (21L to 30L).map(j => (Option(j), j)).toDF("k", "v"), tc, "k")
    val fc = spark.read.format("graft-snapshot").option("path", tc).load()
    assert(fc.agg(count("k")).head().getLong(0) == 25)
    assert(SnapshotScans.scanOf(tc).get.dirsRead == 0,
      "count(col) must answer from the manifest's non-null counts")
    assert(fc.agg(count("v")).head().getLong(0) == 30)
    assert(SnapshotScans.scanOf(tc).get.dirsRead == 2,
      "count on an untracked column must fall back to the full scan")
    // a live deletion vector blocks the shortcut; the answer stays exact
    val (_, nDel) = Snapshots.deleteWhereMoR(spark, t, "k",
      col("k") % 9 === 0)
    assert(nDel == 10)
    assert(fmt.count() == 80)
    assert(SnapshotScans.scanOf(t).get.dirsRead == 2,
      "tombstones must force the scan path")
    // a CoW rewrite records FRESH #dirrows — the shortcut survives
    // maintenance at the post-delete truth
    val t2 = s"$base/t2"
    Snapshots.commit((1L to 30L).map(k => (k, k)).toDF("k", "v"), t2)
    Snapshots.deleteWhere(spark, t2, col("k") > 20L)
    assert(spark.read.format("graft-snapshot").option("path", t2).load()
      .count() == 20)
    assert(SnapshotScans.scanOf(t2).get.dirsRead == 0,
      "a CoW rewrite must record #dirrows — count stays manifest-answered")
    // a PRE-TRACKING manifest (hand-stripped lines — an old table)
    // falls back to the scan, exactly
    val mf = new java.io.File(s"$t2/manifest-v2.txt")
    val stripped = scala.io.Source.fromFile(mf).getLines()
      .filterNot(_.startsWith("#dirrows ")).mkString("\n")
    java.nio.file.Files.write(mf.toPath, stripped.getBytes("UTF-8"))
    assert(spark.read.format("graft-snapshot").option("path", t2).load()
      .count() == 20)
    assert(SnapshotScans.scanOf(t2).get.dirsRead == 1,
      "a dir without #dirrows (pre-tracking history) must force the scan")
    // temporal decode: min/max of a stats-committed TIMESTAMP column
    // answer from the manifest in the column's own type
    val t3 = s"$base/t3"
    def day(i: Int) = java.sql.Timestamp.valueOf(f"2026-02-${i}%02d 08:00:00")
    val rows3 = (1 to 9).map(i => (i.toLong, day(i)))
    val df3 = spark.createDataFrame(rows3).toDF("k", "ts")
    Snapshots.commitWithStats(df3, t3, "ts")
    val mm = spark.read.format("graft-snapshot").option("path", t3).load()
      .agg(min("ts"), max("ts")).head()
    assert(mm.getTimestamp(0) == day(1) && mm.getTimestamp(1) == day(9))
    assert(SnapshotScans.scanOf(t3).get.dirsRead == 0,
      "timestamp min/max must decode from the manifest")
  }

  test("LIMIT pushdown: a bare LIMIT opens only the directory prefix " +
      "whose #dirrows cover it; predicates and live dv refuse the " +
      "prefix pruning; the answer always has exactly n rows") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    (0 until 4).foreach { i =>
      Snapshots.commit((1L to 25L).map(k => (i * 100L + k, k))
        .toDF("k", "v"), t): Unit
    }
    val cat = s"snapspec_${math.abs(base.hashCode + 9)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    // LIMIT 10 over 4 dirs of 25 rows: one directory suffices
    assert(spark.sql(s"SELECT * FROM $cat.t LIMIT 10").collect()
      .length == 10)
    val i1 = SnapshotScans.scanOf(t).get
    assert(i1.dirsTotal == 4 && i1.dirsRead == 1 &&
        i1.pushed.contains("limit:10"),
      s"LIMIT must open the minimal #dirrows prefix ($i1)")
    // a limit past one dir opens exactly two
    assert(spark.sql(s"SELECT * FROM $cat.t LIMIT 30").collect()
      .length == 30)
    assert(SnapshotScans.scanOf(t).get.dirsRead == 2)
    // a limit past the table returns everything
    assert(spark.sql(s"SELECT * FROM $cat.t LIMIT 500").collect()
      .length == 100)
    // a WHERE keeps filters residual — Spark does not push the limit,
    // and the answer stays exact
    assert(spark.sql(s"SELECT * FROM $cat.t WHERE v >= 20 LIMIT 10")
      .collect().length == 10)
    // live tombstones refuse the prefix (hidden rows could under-fill)
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 25 === 0)
    assert(spark.sql(s"SELECT * FROM $cat.t LIMIT 10").collect()
      .length == 10)
    assert(SnapshotScans.scanOf(t).get.dirsRead == 4,
      "dv-live tables must not prefix-prune a LIMIT")
  }

  test("TopN pushdown: ORDER BY + LIMIT opens only the provable " +
      "candidate directories (bounds + null counts); defaults' NULLS " +
      "FIRST, descending, and null-heavy layouts all stay exact") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // range-clustered slices: [1,25], [26,50], [51,75], [76,100]
    (0 until 4).foreach { i =>
      Snapshots.commitWithStats(
        (1L to 25L).map(j => (i * 25L + j, j)).toDF("k", "v"), t, "k"): Unit
    }
    def fmt = spark.read.format("graft-snapshot").option("path", t).load()
    // ascending head: one directory
    val lo = fmt.orderBy(col("k").asc).limit(5).collect().map(_.getLong(0))
    assert(lo.toSeq == (1L to 5L))
    val i1 = SnapshotScans.scanOf(t).get
    assert(i1.dirsTotal == 4 && i1.dirsRead == 1 &&
        i1.pushed.exists(_.startsWith("topn:k:asc")),
      s"ascending TopN must open the head directory only ($i1)")
    // descending tail: one directory
    val hi = fmt.orderBy(col("k").desc).limit(5).collect().map(_.getLong(0))
    assert(hi.toSeq == (100L to 96L by -1))
    assert(SnapshotScans.scanOf(t).get.dirsRead == 1)
    // a limit spanning a boundary opens exactly two
    assert(fmt.orderBy(col("k").asc).limit(30).count() == 30)
    assert(SnapshotScans.scanOf(t).get.dirsRead == 2)
    // NULLS handling: a slice whose k is entirely NULL-bearing refuses
    // value-only pruning under the ASC default (NULLS FIRST) unless the
    // null counts prove where the nulls live — they do
    val tn = s"$base/tn"
    Snapshots.commitWithStats(
      (1L to 20L).map(j => (Option(j), j)).toDF("k", "v"), tn, "k")
    Snapshots.commitWithStats(
      (1L to 10L).map(j => (if (j % 2 == 0) Some(100L + j) else None, j))
        .toDF("k", "v"), tn, "k")
    def fmtN = spark.read.format("graft-snapshot").option("path", tn).load()
    // ASC NULLS FIRST, n=5: the 5 nulls of dir 2 lead the answer
    val heads = fmtN.orderBy(col("k").asc_nulls_first).limit(5)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(heads.forall(_.isEmpty), "the five nulls must lead")
    assert(SnapshotScans.scanOf(tn).get.dirsRead == 1,
      "null counts must prove the nulls' directory alone suffices")
    // ASC NULLS LAST: values only — dir 1 suffices for n=5
    assert(fmtN.orderBy(col("k").asc_nulls_last).limit(5)
      .collect().map(_.getLong(0)).toSeq == (1L to 5L))
    assert(SnapshotScans.scanOf(tn).get.dirsRead == 1)
    // a dv-live table refuses the pruning but stays exact
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 10 === 0)
    assert(fmt.orderBy(col("k").asc).limit(5).collect()
      .map(_.getLong(0)).toSeq == (1L to 5L))
    assert(SnapshotScans.scanOf(t).get.dirsRead == 4,
      "tombstones must force the full scan under TopN")
  }

  test("TopN ties and multi-column orderings: duplicated boundary keys " +
      "return a valid tie-broken top-n, and ORDER BY k, tag prunes on " +
      "the leading column with STRICT boundary coverage so a " +
      "boundary-tied row with a winning secondary key survives") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // boundary value 10 DUPLICATED across dirs 1 and 2; dir 1's copies
    // carry LOSING tags (z*), dir 2's copies WINNING ones (a*)
    Snapshots.commitWithStats(
      ((1L to 9L).map(k => (k, s"t$k")) ++ Seq((10L, "z1"), (10L, "z2")))
        .toDF("k", "tag"), t, "k")
    Snapshots.commitWithStats(
      (Seq((10L, "a1"), (10L, "a2")) ++ (11L to 18L).map(k => (k, s"t$k")))
        .toDF("k", "tag"), t, "k")
    Snapshots.commitWithStats(
      (21L to 30L).map(k => (k, s"t$k")).toDF("k", "tag"), t, "k")
    def fmt = spark.read.format("graft-snapshot").option("path", t).load()
    // SINGLE-column, inclusive coverage: dir 1 alone covers n=10 (its
    // 11 rows all ≤ the next boundary 10) — which tied 10 surfaces is
    // the usual no-total-tiebreaker nondeterminism, but the sort-KEY
    // values are deterministic and the set is a valid top-n
    val ks = fmt.orderBy(col("k").asc).limit(10).collect()
      .map(_.getLong(0)).toSeq
    assert(ks == ((1L to 9L) :+ 10L),
      s"tie-broken top-10 keys must be 1..9 + one 10 ($ks)")
    assert(SnapshotScans.scanOf(t).get.dirsRead == 1,
      "inclusive coverage: the boundary dir alone provably covers n")
    // MULTI-column: the true top-10 ends with dir 2's (10, a1) — the
    // strict boundary must keep BOTH boundary dirs in the read set
    val rows = fmt.orderBy(col("k").asc, col("tag").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == (1L to 9L).map(k => (k, s"t$k")) :+ ((10L, "a1")),
      s"the winning secondary key must surface ($rows)")
    val im = SnapshotScans.scanOf(t).get
    assert(im.dirsRead == 2 &&
        im.pushed.exists(p => p.startsWith("topn:k:asc") &&
          p.endsWith(":multi")),
      s"multi-column TopN must prune strictly on the leading column ($im)")
    // multi-column NULLS FIRST keeps every null-bearing dir (nulls tie
    // on the leading key; the secondary key ranks them)
    val tn = s"$base/tn"
    Snapshots.commitWithStats(
      (Seq((Option.empty[Long], "zz")) ++ (1L to 9L).map(k =>
        (Option(k), s"t$k"))).toDF("k", "tag"), tn, "k")
    Snapshots.commitWithStats(
      (Seq((Option.empty[Long], "aa")) ++ (11L to 19L).map(k =>
        (Option(k), s"t$k"))).toDF("k", "tag"), tn, "k")
    val nf = spark.read.format("graft-snapshot").option("path", tn).load()
      .orderBy(col("k").asc_nulls_first, col("tag").asc).limit(1)
      .collect().map(_.getString(1)).toSeq
    assert(nf == Seq("aa"),
      s"the secondary key must rank the tied nulls across dirs ($nf)")
    assert(SnapshotScans.scanOf(tn).get.dirsRead == 2,
      "multi-column NULLS FIRST must keep every null-bearing dir")
  }

  test("$files metadata table: head dirs with #dirrows counts, on-disk " +
      "bytes, and the shallow-clone external flag; pre-tracking dirs " +
      "surface NULL rows honestly") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    Snapshots.commit((1L to 30L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((31L to 50L).map(k => (k, k)).toDF("k", "v"), t)
    val cat = s"snapspec_${math.abs(base.hashCode + 7)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val files = spark.sql(s"SELECT * FROM $cat.`t$$files`").collect()
    assert(files.length == 2)
    assert(files.map(_.getLong(1)).sorted.toSeq == Seq(20L, 30L),
      "rows must come from the #dirrows lines")
    assert(files.forall(r => r.getLong(2) > 0L && !r.getBoolean(3)),
      "bytes positive, nothing external")
    // a shallow clone's $files shows the re-keyed EXTERNAL dirs
    Snapshots.cloneShallow(spark, t, s"$base/c")
    val cfiles = spark.sql(s"SELECT * FROM $cat.`c$$files`").collect()
    assert(cfiles.length == 2 && cfiles.forall(_.getBoolean(3)),
      "clone dirs must flag external")
    assert(cfiles.map(_.getLong(1)).sorted.toSeq == Seq(20L, 30L),
      "#dirrows re-key with their dirs through the clone")
    // pre-tracking history (hand-stripped lines) surfaces NULL rows
    val mf = new java.io.File(s"$t/manifest-v2.txt")
    val stripped = scala.io.Source.fromFile(mf).getLines()
      .filterNot(_.startsWith("#dirrows ")).mkString("\n")
    java.nio.file.Files.write(mf.toPath, stripped.getBytes("UTF-8"))
    val nulled = spark.sql(s"SELECT * FROM $cat.`t$$files`").collect()
    assert(nulled.forall(_.isNullAt(1)),
      "a dir without a #dirrows line must surface NULL, never a guess")
  }

  test("pruning evidence is keyed by table: two scans find their own " +
      "counts, neither clobbered by the other") {
    import spark.implicits._
    val base = freshBase()
    val ta = s"$base/ta"
    val tb = s"$base/tb"
    Snapshots.commitWithStats((1L to 50L).map(k => (k, k)).toDF("k", "v"),
      ta, "k")
    Snapshots.commitWithStats((51L to 99L).map(k => (k, k)).toDF("k", "v"),
      ta, "k")
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), tb)
    // scan A (pruned), then scan B (unpruned) — B planning after A must
    // not overwrite A's proof for a consumer that asks for A's table
    assert(spark.read.format("graft-snapshot").option("path", ta).load()
      .filter(col("k") <= 10L).count() == 10)
    assert(spark.read.format("graft-snapshot").option("path", tb).load()
      .filter(col("v") >= 1L).count() == 10)
    val a = SnapshotScans.scanOf(ta).get
    assert(a.dirsTotal == 2 && a.dirsRead == 1,
      s"table-keyed evidence for ta (${a.dirsRead}/${a.dirsTotal})")
    val b = SnapshotScans.scanOf(tb).get
    assert(b.table == tb && b.dirsTotal == 1)
    assert(SnapshotScans.scanOf(s"$base/never_scanned").isEmpty)
  }

  test("runtime filtering: a dim-side filter prunes fact directories " +
      "at join time through the manifest stats (dynamic partition " +
      "pruning on the native batch scan)") {
    import spark.implicits._
    val base = freshBase()
    val fact = s"$base/fact"
    Seq(1L to 25L, 26L to 50L, 51L to 75L, 76L to 100L).foreach(r =>
      Snapshots.commitWithStats(
        r.map(k => (k, k * 3L)).toDF("k", "cents"), fact, "k"): Unit)
    Snapshots.commit(
      (1L to 100L).map(k => (k, (k - 1) / 25)).toDF("dk", "band"),
      s"$base/dim")
    val cat = s"snapdpp_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val df = spark.sql(s"""SELECT count(*) AS n,
      CAST(sum(f.cents) AS BIGINT) AS s
      FROM $cat.fact f JOIN $cat.dim d ON f.k = d.dk WHERE d.band = 2""")
    val r = df.head()
    assert(r.getLong(0) == 25 && r.getLong(1) == (51L to 75L).map(_ * 3).sum,
      "the joined answer must be exact")
    val info = SnapshotScans.scanOf(fact).get
    assert(info.dirsTotal == 4 && info.dirsRead == 1 &&
        info.pushed.exists(_.startsWith("runtime:")),
      s"the dim side's keys must prune the fact scan at runtime ($info)")
    assert(df.queryExecution.executedPlan.toString
        .toLowerCase.contains("dynamicpruning"),
      "the physical plan must carry the dynamic pruning subquery")
    // live deletion vectors STAY on the batch path: the tombstone
    // anti-join folds into the readers as a broadcast hash probe, so
    // the dv-bearing fact still prunes at runtime AND answers at the
    // post-delete truth
    val fact2 = s"$base/fact2"
    Seq(1L to 50L, 51L to 100L).foreach(r =>
      Snapshots.commitWithStats(
        r.map(k => (k, k * 3L)).toDF("k", "cents"), fact2, "k"): Unit)
    Snapshots.deleteWhereMoR(spark, fact2, "k", col("k") === 60L)
    val r2 = spark.sql(s"""SELECT count(*) AS n
      FROM $cat.fact2 f JOIN $cat.dim d ON f.k = d.dk
      WHERE d.band = 2""").head()
    assert(r2.getLong(0) == 24, "the dv batch answer must stay exact")
    val i2 = SnapshotScans.scanOf(fact2).get
    assert(i2.dirsTotal == 2 && i2.dirsRead == 1 &&
        i2.pushed.exists(_.startsWith("runtime:")) &&
        i2.pushed.exists(_.startsWith("dv:")) &&
        i2.pushed.contains("native-batch"),
      s"a dv-bearing table keeps runtime filtering on the batch path ($i2)")
    // BLOOM-driven runtime pruning: an UNCLUSTERED fact (overlapping
    // key ranges per dir — range stats can prove nothing) still prunes
    // at join time through its #dirbloom membership sketches
    val fact3 = s"$base/fact3"
    Seq(0, 1, 2, 3).foreach(i =>
      Snapshots.commitWithBloom(
        (1L to 100L).filter(_ % 4 == i).map(k => (k, k * 3L))
          .toDF("k", "cents"), fact3, "k", fpp = 1e-8): Unit)
    Snapshots.commit(
      (1L to 100L).map(k => (k, k % 4)).toDF("dk", "res"), s"$base/dim4")
    val r3 = spark.sql(s"""SELECT count(*) AS n
      FROM $cat.fact3 f JOIN $cat.dim4 d ON f.k = d.dk
      WHERE d.res = 1""").head()
    assert(r3.getLong(0) == 25)
    val i3 = SnapshotScans.scanOf(fact3).get
    assert(i3.dirsTotal == 4 && i3.dirsRead == 1 &&
        i3.pushed.exists(_.startsWith("runtime:")),
      s"the dim keys must prune through the Bloom sketches ($i3)")
  }

  test("dv tombstone fold on the batch scan: unprojected key columns " +
      "append-probe-project, NULL keys survive the anti-join, string " +
      "keys probe correctly, and materializeDeletes answers parity") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // string key, with a NULL-keyed row: anti-join equality never
    // matches NULL, so the null-keyed row must survive every delete
    Snapshots.commitWithStats(Seq(
      (1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, Option.empty[String], 30L), (4L, Option("d"), 40L))
      .toDF("id", "key", "v"), t, "id")
    Snapshots.commitWithStats(Seq(
      (5L, Option("e"), 50L), (6L, Option("b"), 60L))
      .toDF("id", "key", "v"), t, "id")
    Snapshots.deleteWhereMoR(spark, t, "key", col("key") === "b")
    def fmt = spark.read.format("graft-snapshot").option("path", t).load()
    // projection WITHOUT the key column: the reader appends `key`,
    // probes, and projects it back out — sum excludes both "b" rows,
    // keeps the NULL-keyed row
    val s1 = fmt.select("v").agg(sum("v")).head().getLong(0)
    assert(s1 == 10L + 30L + 40L + 50L,
      s"unprojected-key dv fold must drop exactly the tombstoned rows ($s1)")
    val i1 = SnapshotScans.scanOf(t).get
    assert(i1.pushed.contains("native-batch") &&
        i1.pushed.exists(_.startsWith("dv:")),
      s"a dv-bearing flat table must ride the batch path ($i1)")
    // static pruning composes with the fold: id >= 5 opens one dir
    assert(fmt.filter(col("id") >= 5L).count() == 1)
    val i2 = SnapshotScans.scanOf(t).get
    assert(i2.dirsTotal == 2 && i2.dirsRead == 1,
      s"manifest pruning must stay live under dvs ($i2)")
    // bit-parity with the library read (the audited V1 anti-join;
    // select-by-name — the library's using-column anti-join reorders
    // the key column first)
    assert(bitEqual(fmt.select("id", "key", "v"),
      Snapshots.read(spark, t).select("id", "key", "v")),
      "batch dv fold must equal the library's anti-join bit-for-bit")
    // a second MoR delete composes (dv union), then materialize:
    // answers identical on both sides of the tombstone window
    Snapshots.deleteWhereMoR(spark, t, "key", col("key") === "e")
    val before = fmt.orderBy("id").collect().toSeq
    assert(before.map(_.getLong(0)) == Seq(1L, 3L, 4L))
    val (_, _, rw) = Snapshots.materializeDeletes(spark, t)
    assert(rw > 0)
    val after = fmt.orderBy("id").collect().toSeq
    assert(before == after,
      "materializeDeletes must preserve the dv view exactly")
  }

  test("#rename on the batch scan: per-dir physical schemas fold the " +
      "rename at planning, re-keyed stats keep pruning, chains " +
      "converge, and the dv fold composes") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // dir 1 under the OLD physical name v; rename; dir 2 under w
    Snapshots.commitWithStats(
      (1L to 30L).map(k => (k, k * 2L)).toDF("k", "v"), t, "k")
    Snapshots.renameColumn(spark, t, "v", "w")
    Snapshots.commitWithStats(
      (31L to 60L).map(k => (k, k * 3L)).toDF("k", "w"), t, "k")
    def fmt = spark.read.format("graft-snapshot").option("path", t).load()
    assert(bitEqual(fmt.select("k", "w"),
      Snapshots.read(spark, t).select("k", "w")),
      "renamed batch read must equal the library fold bit-for-bit")
    val i0 = SnapshotScans.scanOf(t).get
    assert(i0.pushed.contains("native-batch"),
      s"a renamed table must ride the batch path ($i0)")
    // re-keyed #dirstats still prune (renameColumn re-keys the lines)
    assert(fmt.filter(col("k") >= 31L).agg(sum("w")).head().getLong(0) ==
      (31L to 60L).map(_ * 3).sum)
    val i1 = SnapshotScans.scanOf(t).get
    assert(i1.dirsTotal == 2 && i1.dirsRead == 1 &&
        i1.pushed.contains("native-batch"),
      s"re-keyed stats must prune on the batch path ($i1)")
    // a filter on the RENAMED column finds values living under the old
    // physical name in dir 1 (per-dir footer re-keying)
    assert(fmt.filter(col("w") === 20L).select("k").head().getLong(0) == 10L)
    // chains converge: w -> u, a third dir written natively under u
    Snapshots.renameColumn(spark, t, "w", "u")
    Snapshots.commit((61L to 70L).map(k => (k, k * 5L)).toDF("k", "u"), t)
    assert(fmt.schema.fieldNames.toSeq == Seq("k", "u"))
    assert(fmt.agg(sum("u")).head().getLong(0) ==
      (1L to 30L).map(_ * 2).sum + (31L to 60L).map(_ * 3).sum +
        (61L to 70L).map(_ * 5).sum)
    assert(SnapshotScans.scanOf(t).get.pushed.contains("native-batch"))
    // dv composes with the rename fold on the same batch scan
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 10 === 0)
    assert(bitEqual(fmt.select("k", "u"),
      Snapshots.read(spark, t).select("k", "u")),
      "dv + rename must still equal the library fold")
    val i2 = SnapshotScans.scanOf(t).get
    assert(i2.pushed.contains("native-batch") &&
        i2.pushed.exists(_.startsWith("dv:")),
      s"dv + rename must stay on the batch path ($i2)")
  }

  test("evidence no-downgrade: rendering the executed plan after a " +
      "runtime-filtered scan must not clobber the runtime-marked " +
      "evidence for the same table and version") {
    import spark.implicits._
    val base = freshBase()
    val fact = s"$base/fact"
    Seq(1L to 25L, 26L to 50L).foreach(r =>
      Snapshots.commitWithStats(
        r.map(k => (k, k * 2L)).toDF("k", "cents"), fact, "k"): Unit)
    Snapshots.commit((1L to 50L).map(k => (k, (k - 1) / 25))
      .toDF("dk", "band"), s"$base/dim")
    val cat = s"snapndg_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val df = spark.sql(s"""SELECT count(*) AS n FROM $cat.fact f
      JOIN $cat.dim d ON f.k = d.dk WHERE d.band = 1""")
    assert(df.head().getLong(0) == 25)
    val marked = SnapshotScans.scanOf(fact).get
    assert(marked.dirsRead == 1 &&
      marked.pushed.exists(_.startsWith("runtime:")))
    // the describe path re-evaluates the UNFILTERED partition list —
    // before the no-downgrade rule this overwrote the evidence with a
    // misleading "no runtime pruning" record
    val rendered = df.queryExecution.executedPlan.toString
    assert(rendered.nonEmpty)
    val still = SnapshotScans.scanOf(fact).get
    assert(still.dirsRead == 1 &&
        still.pushed.exists(_.startsWith("runtime:")),
      s"plan render must not clobber runtime-marked evidence ($still)")
  }

  test("partitioned batch scan: partition values materialize from file " +
      "paths (numeric-looking strings verbatim, sentinel NULLs), " +
      "predicates prune at FILE level statically and at runtime, and " +
      "mixed layouts fall back to the V1 bridge") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // string partition values: "01" must stay "01" (no inference),
    // None rides the Hive sentinel; two commits, same spec
    def rows(tag: String) = Seq(
      (1L, Option("01"), tag), (2L, Option("1.10"), tag),
      (3L, Option.empty[String], tag), (4L, Option("a b"), tag))
    Snapshots.commitPartitioned(rows("x").toDF("k", "grp", "tag"),
      t, Seq("grp"))
    Snapshots.commitPartitioned(rows("y").toDF("k", "grp", "tag"),
      t, Seq("grp"))
    def fmt = spark.read.format("graft-snapshot").option("path", t).load()
    val lib = Snapshots.read(spark, t)
    assert(bitEqual(fmt.select("k", "grp", "tag"),
      lib.select("k", "grp", "tag")),
      "the partitioned batch read must equal the library read")
    val i0 = SnapshotScans.scanOf(t).get
    assert(i0.pushed.contains("native-batch") &&
        i0.pushed.exists(_.startsWith("pfiles:8/8")),
      s"a uniform-spec table must ride the batch path ($i0)")
    // static file-level pruning on the exact path value — "01" is NOT
    // 1, "1.10" is NOT "1.1"
    assert(fmt.filter(col("grp") === "01").count() == 2)
    assert(SnapshotScans.scanOf(t).get.pushed.contains("pfiles:2/8"))
    assert(fmt.filter(col("grp") === "1").count() == 0)
    assert(SnapshotScans.scanOf(t).get.pushed.contains("pfiles:0/8"))
    // escaped value round-trips; IS NULL finds exactly the sentinels
    assert(fmt.filter(col("grp") === "a b").count() == 2)
    assert(SnapshotScans.scanOf(t).get.pushed.contains("pfiles:2/8"))
    assert(fmt.filter(col("grp").isNull).count() == 2)
    assert(SnapshotScans.scanOf(t).get.pushed.contains("pfiles:2/8"))
    // projecting ONLY the partition column still answers (path-fed)
    assert(fmt.select("grp").filter(col("grp").isNotNull).count() == 6)
    // RUNTIME filtering on the partition column: the dim side's keys
    // prune partition files at join time
    Snapshots.commit(Seq(("01", 1L), ("1.10", 2L), ("a b", 3L))
      .toDF("g", "band"), s"$base/dim")
    val cat = s"snappart_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val r = spark.sql(s"""SELECT count(*) AS n FROM $cat.t f
      JOIN $cat.dim d ON f.grp = d.g WHERE d.band = 3""").head()
    assert(r.getLong(0) == 2)
    val ir = SnapshotScans.scanOf(t).get
    assert(ir.pushed.exists(_.startsWith("runtime:")) &&
        ir.pushed.contains("pfiles:2/8"),
      s"dim keys must prune partition files at runtime ($ir)")
    // a FLAT append next to the spec'd dirs = mixed layout -> V1 bridge
    Snapshots.commit(Seq((9L, Option("zz"), "f")).toDF("k", "grp", "tag"), t)
    assert(fmt.filter(col("grp") === "zz").count() == 1)
    val iv = SnapshotScans.scanOf(t).get
    assert(!iv.pushed.contains("native-batch"),
      s"mixed flat+spec layouts must stay on the V1 bridge ($iv)")
  }

  test("CTAS through the catalog: a failed create aborts clean, " +
      "unknown properties and PARTITIONED BY refuse up front, and the " +
      "happy path lands version 1 with its schema contract") {
    import spark.implicits._
    val base = freshBase()
    val cat = s"snapctas_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    (1L to 10L).toDF("k").createOrReplaceTempView("ctas_spec_src")
    // a SELECT that fails mid-write aborts the staged create — the
    // path must be gone, not a half-table
    intercept[Exception](spark.sql(s"""CREATE TABLE $cat.t AS
      SELECT assert_true(k < 5) AS chk, k FROM ctas_spec_src""").collect())
    assert(!new java.io.File(s"$base/t").exists(),
      "an aborted CTAS must delete the fresh path whole")
    // unknown table properties refuse before anything lands
    val e2 = intercept[Exception](spark.sql(s"""CREATE TABLE $cat.t
      TBLPROPERTIES ('zap' = '1') AS SELECT k FROM ctas_spec_src"""))
    assert(e2.getMessage.contains("unsupported table propert"),
      s"unknown property must refuse (${e2.getMessage})")
    assert(!new java.io.File(s"$base/t").exists())
    // PARTITIONED BY refuses (partition-valued commits are the
    // library's commitPartitioned decision)
    val e3 = intercept[Exception](spark.sql(s"""CREATE TABLE $cat.t
      PARTITIONED BY (k) AS SELECT k FROM ctas_spec_src"""))
    assert(e3.getMessage.contains("PARTITIONED BY"),
      s"partitioned CTAS must refuse (${e3.getMessage})")
    // happy path: v1 with the schema contract, readable immediately
    spark.sql(
      s"CREATE TABLE $cat.t AS SELECT k, k * 2 AS v FROM ctas_spec_src")
    assert(Snapshots.latestVersion(spark, s"$base/t") == 1)
    assert(Snapshots.schemaOf(spark, s"$base/t", 1).isDefined)
    assert(spark.sql(s"SELECT CAST(sum(v) AS BIGINT) AS s FROM $cat.t")
      .head().getLong(0) == (1L to 10L).map(_ * 2).sum)
    // REPLACE refuses
    val e4 = intercept[Exception](spark.sql(
      s"CREATE OR REPLACE TABLE $cat.t AS SELECT k FROM ctas_spec_src"))
    assert(e4.getMessage.contains("read-only") ||
      e4.getMessage.toLowerCase.contains("replace"))
  }

  test("OR / IS NULL / IS NOT NULL pushdown: null-population pruning " +
      "from the 5-token counts and the all-null sentinel line, " +
      "two-column disjunctions prune to the union of their branches, " +
      "and every refusal reads everything exactly") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // dir1: v all non-null (k 1..30); dir2: v mixed (31..60, nulls on
    // %5); dir3: v ALL NULL (61..90) — the sentinel-line case
    def v(k: Long): Option[Long] =
      if (k <= 30) Some(k * 10L)
      else if (k <= 60) { if (k % 5 == 0) None else Some(k * 10L) }
      else None
    Seq(1L to 30L, 31L to 60L, 61L to 90L).foreach(r =>
      Snapshots.commitWithStats(
        r.map(k => (k, v(k))).toDF("k", "v"), t, "v"): Unit)
    val fmt = spark.read.format("graft-snapshot").option("path", t).load()
    val lib = Snapshots.read(spark, t)
    // IS NULL: the null-free dir skips (non-null count == #dirrows)
    assert(fmt.filter(col("v").isNull).count() ==
      (1L to 90L).count(v(_).isEmpty))
    val i1 = SnapshotScans.scanOf(t).get
    assert(i1.dirsTotal == 3 && i1.dirsRead == 2,
      s"IS NULL must skip the null-free dir ($i1)")
    // IS NOT NULL: the all-null dir skips via its sentinel line
    assert(bitEqual(fmt.filter(col("v").isNotNull),
      lib.filter(col("v").isNotNull)))
    val i2 = SnapshotScans.scanOf(t).get
    assert(i2.dirsRead == 2, s"IS NOT NULL must skip the all-null dir ($i2)")
    // <=> NULL is exactly IS NULL
    assert(fmt.filter(col("v") <=> lit(null)).count() ==
      (1L to 90L).count(v(_).isEmpty))
    assert(SnapshotScans.scanOf(t).get.dirsRead == 2)
    // value predicates skip the all-null dir too — its sentinel range
    // [0, -1] is the empty set
    assert(fmt.filter(col("v") === 100L).count() == 1)
    assert(SnapshotScans.scanOf(t).get.dirsRead < 3,
      "the empty-set sentinel must reject value predicates")
    // two-column OR: each branch prunes to its own dir; the union reads
    val t2 = s"$base/t2"
    Seq(1L to 40L, 41L to 80L, 81L to 120L).foreach(r =>
      Snapshots.commitWithMultiStats(
        r.map(k => (k, k * 2L)).toDF("k", "v2"), t2, Seq("k", "v2")): Unit)
    val fmt2 = spark.read.format("graft-snapshot").option("path", t2).load()
    assert(fmt2.filter(col("k") === 1L || col("v2") === 240L).count() == 2)
    val i3 = SnapshotScans.scanOf(t2).get
    assert(i3.dirsTotal == 3 && i3.dirsRead == 2 &&
        i3.pushed.exists(_.startsWith("OrPred")),
      s"a two-column Or must open exactly its branches' union ($i3)")
    // refusal: an untranslatable branch degrades the Or to reading all
    assert(fmt2.filter(col("k") === 1L ||
      substring(col("k").cast("string"), 1, 1) === "9").count() > 1)
    assert(SnapshotScans.scanOf(t2).get.dirsRead == 3,
      "an untranslatable branch must read everything")
    // refusal: dirs WITHOUT 5-token counts read for null predicates
    val t3 = s"$base/t3"
    Snapshots.commit((1L to 10L).map(k => (k, Option(k)))
      .toDF("k", "v"), t3)
    assert(spark.read.format("graft-snapshot").option("path", t3).load()
      .filter(col("v").isNull).count() == 0)
    assert(SnapshotScans.scanOf(t3).get.dirsRead == 1,
      "no counts -> IS NULL must read the dir")
  }

  test("legacy 4-token #dirstats on a TEMPORAL column never prune or " +
      "answer aggregates: the 5th token is the encoding discriminator " +
      "(old epoch-second stats vs the r16 micros encoding)") {
    import spark.implicits._
    val base = freshBase()
    val t = s"$base/t"
    // two dirs of timestamps a year apart, committed WITHOUT stats
    val rows = (0L until 20L).map(i =>
      (i, java.sql.Timestamp.valueOf(s"2020-0${1 + (i % 2)}-10 00:00:0" +
        s"${i % 10}")))
    Snapshots.commit(rows.filter(_._1 < 10L).toDF("k", "ts"), t)
    Snapshots.commit(rows.filter(_._1 >= 10L).toDF("k", "ts"), t)
    // forge LEGACY 4-token lines carrying epoch-SECONDS bounds (the
    // pre-r16 cast("long") behavior — ~1.6e9, vs micros ~1.6e15): if
    // pruning trusted them, every micros-encoded predicate would fall
    // outside [mn, mx] and BOTH dirs would be skipped — silent wrong
    // emptiness
    val mPath = java.nio.file.Paths.get(s"$t/manifest-v2.txt")
    val lines = new String(java.nio.file.Files.readAllBytes(mPath), "UTF-8")
    val dirs = lines.linesIterator.filterNot(_.startsWith("#")).toSeq
    val loSec = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
      .getTime / 1000L
    val hiSec = java.sql.Timestamp.valueOf("2020-03-01 00:00:00")
      .getTime / 1000L
    val forged = lines + (if (lines.endsWith("\n")) "" else "\n") +
      dirs.map(d => s"#dirstats $d ts $loSec $hiSec\n").mkString
    java.nio.file.Files.write(mPath, forged.getBytes("UTF-8"))
    // a pushed timestamp range must read EVERYTHING (legacy lines
    // ignored for the temporal type) and answer exactly
    val n = spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("ts") >= lit("2020-02-01").cast("timestamp")).count()
    assert(n == 10, s"the February half must survive ($n)")
    val info = SnapshotScans.scanOf(t).get
    assert(info.dirsRead == info.dirsTotal,
      s"legacy temporal lines must not prune ($info)")
    // and metadata min/max must REFUSE (full scan) rather than decode
    // seconds as micros — which would answer a 1970 timestamp
    val cat = s"snaplegacy_${math.abs(base.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    val mn = spark.sql(s"SELECT min(ts) AS m FROM $cat.t").head()
      .getTimestamp(0)
    assert(SnapshotScans.scanOf(t).get.dirsRead > 0,
      "min over legacy temporal stats must fall back to a real scan")
    assert(mn == rows.map(_._2).min(Ordering.by((x: java.sql.Timestamp) =>
      x.getTime)), s"the fallback answer must stay exact ($mn)")
    // an INTEGRAL column's 4-token legacy line stays trusted: same
    // manifest shape on k prunes as before
    val forged2 = forged + s"#dirstats ${dirs.head} k 0 9\n" +
      s"#dirstats ${dirs.last} k 10 19\n"
    java.nio.file.Files.write(mPath, forged2.getBytes("UTF-8"))
    assert(spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("k") <= 5L).count() == 6)
    val info2 = SnapshotScans.scanOf(t).get
    assert(info2.dirsRead == 1 && info2.dirsTotal == 2,
      s"integral legacy lines keep pruning ($info2)")
  }
}
