package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {

  private def freshTable(): String = {
    val t = s"/tmp/graft_io/snapspec/${java.util.UUID.randomUUID()}"
    t
  }

  test("commit/read: versions accumulate; time travel reproduces history") {
    import spark.implicits._
    val t = freshTable()
    val v1 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)
    val v2 = Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), t)
    assert(v1 == 1 && v2 == 2 && Snapshots.latestVersion(spark, t) == 2)
    assert(Snapshots.read(spark, t, Some(1)).count() == 2)
    assert(Snapshots.read(spark, t).count() == 3) // latest
    assert(Snapshots.read(spark, t, Some(2)).as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("isolation: a plan resolved at v1 is untouched by a later commit") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t)
    // resolve the reader BEFORE v2 exists — its file list is fixed
    val readerAtV1 = Snapshots.read(spark, t)
    Snapshots.commit(Seq((3L, 999L)).toDF("id", "v"), t)
    assert(readerAtV1.agg(sum("v")).head.getLong(0) == 30L)
    // and explicit time travel to v1 AFTER v2 gives the same answer
    assert(Snapshots.read(spark, t, Some(1)).agg(sum("v")).head.getLong(0) == 30L)
  }

  test("atomic publish: a torn commit (data, no manifest) is invisible; retry lands") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    // simulate a writer that died after the data write, before publish:
    // orphan data directory with NO manifest naming it
    Seq((99L, "orphan")).toDF("id", "s").write.parquet(s"$t/data/c-orphan")
    assert(Snapshots.latestVersion(spark, t) == 1)
    assert(Snapshots.read(spark, t).count() == 1) // orphan never read
    // the retried commit publishes cleanly despite the orphan
    assert(Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), t) == 2)
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("read before any commit fails loudly") {
    val t = freshTable()
    intercept[IllegalArgumentException] { Snapshots.read(spark, t) }
  }

  test("multi-writer CAS: concurrent commits all land, none clobbered") {
    import spark.implicits._
    val t = freshTable()
    val writers = 6
    // all writers race the version claim simultaneously; each commits a
    // distinct single-row frame from its own thread
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (1 to writers).map { i =>
      scala.concurrent.Future {
        Snapshots.commit(Seq((i.toLong, s"w$i")).toDF("id", "s"), t)
      }
    }
    val versions = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(120, "s")).sorted
    pool.shutdown()
    // every writer won a DISTINCT version 1..N — the exclusive claim
    // cannot hand the same version to two writers
    assert(versions == (1 to writers).toList, versions.toString)
    assert(Snapshots.latestVersion(spark, t) == writers)
    // no lost update: the final chain carries every writer's rows
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().sortBy(_._1)
      .toSeq == (1 to writers).map(i => (i.toLong, s"w$i")))
    // append semantics held at every intermediate version too
    (1 to writers).foreach { v =>
      assert(Snapshots.read(spark, t, Some(v)).count() == v.toLong)
    }
  }

  test("vacuum: expired versions unreadable, retained intact, orphans GC'd") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), t)
    Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), t)
    // crashed-commit orphan: data with no manifest
    Seq((99L, "orphan")).toDF("id", "s").write.parquet(s"$t/data/c-orphan")
    // a fresh unreferenced dir is indistinguishable from an IN-FLIGHT
    // commit's data: the default grace window must spare it...
    val (nmG, ndG) = Snapshots.vacuum(spark, t, keepVersions = 2)
    assert(nmG == 1 && ndG == 0, s"grace window violated: ($nmG, $ndG)")
    assert(Snapshots.read(spark, t).count() == 3) // table intact
    // ...and only an explicit grace-0 vacuum (no commits in flight) GCs
    val (nm, nd) = Snapshots.vacuum(spark, t, keepVersions = 2,
      orphanGraceMs = 0L)
    // v1's manifest already expired above; v1's data dir is still
    // referenced by v2/v3 manifests (append semantics) so only the
    // orphan dir deletes now
    assert((nm, nd) == ((0, 1)), s"($nm, $nd)")
    intercept[java.io.FileNotFoundException] {
      Snapshots.read(spark, t, Some(1)).collect()
    }
    assert(Snapshots.read(spark, t, Some(2)).count() == 2)
    assert(Snapshots.read(spark, t).count() == 3)
    assert(Snapshots.latestVersion(spark, t) == 3)
    // a later commit continues the chain past the vacuum
    Snapshots.commit(Seq((4L, "d")).toDF("id", "s"), t)
    assert(Snapshots.read(spark, t).count() == 4)
    // keeping only the latest version GCs nothing data-wise (append
    // semantics: the newest manifest references every live dir)
    val (nm2, nd2) = Snapshots.vacuum(spark, t, keepVersions = 1)
    assert(nm2 == 2 && nd2 == 0, s"($nm2, $nd2)")
    assert(Snapshots.read(spark, t).count() == 4)
  }

  test("commitIfAbsent: replayed batch no-ops; concurrent duplicates commit once") {
    import spark.implicits._
    val t = freshTable()
    assert(Snapshots.commitIfAbsent(Seq((1L, "a")).toDF("id", "s"), t,
      "w1", 0L) == Some(1))
    // at-least-once replay of the same (writer, batch): must no-op
    assert(Snapshots.commitIfAbsent(Seq((1L, "a")).toDF("id", "s"), t,
      "w1", 0L).isEmpty)
    assert(Snapshots.read(spark, t).count() == 1)
    // a different batch and a different writer both land
    assert(Snapshots.commitIfAbsent(Seq((2L, "b")).toDF("id", "s"), t,
      "w1", 1L) == Some(2))
    assert(Snapshots.commitIfAbsent(Seq((3L, "c")).toDF("id", "s"), t,
      "w2", 0L) == Some(3))
    assert(Snapshots.read(spark, t).count() == 3)
    // concurrent duplicates of ONE batch: exactly one side commits
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val dups = (1 to 4).map { _ =>
      scala.concurrent.Future {
        Snapshots.commitIfAbsent(Seq((9L, "dup")).toDF("id", "s"), t, "w1", 2L)
      }
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(dups),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(results.flatten.size == 1, results.toString)
    assert(Snapshots.read(spark, t).filter(col("id") === 9L).count() == 1)
    // interleaved regular commits keep their own path working
    assert(Snapshots.commit(Seq((4L, "d")).toDF("id", "s"), t) ==
      Snapshots.latestVersion(spark, t))
  }

  test("schema enforcement: drift refused, additive evolution explicit + merge-read") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    // re-typed column: refused before any data write
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((2L, 9L)).toDF("id", "s"), t)
    }
    assert(e1.getMessage.contains("schema drift refused"))
    // reordered columns: refused even with allowEvolve (not additive)
    intercept[IllegalArgumentException] {
      Snapshots.commit(Seq(("b", 2L)).toDF("s", "id"), t, allowEvolve = true)
    }
    // additive without the flag: refused with the hint
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((2L, "b", 7L)).toDF("id", "s", "extra"), t)
    }
    assert(e2.getMessage.contains("allowEvolve"))
    assert(Snapshots.latestVersion(spark, t) == 1, "refused commits moved the version")
    // additive WITH the flag lands; merge-read null-fills old rows
    Snapshots.commit(Seq((2L, "b", 7L)).toDF("id", "s", "extra"), t,
      allowEvolve = true)
    val rows = Snapshots.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(7L))), rows.toString)
    // post-evolution commits enforce the EVOLVED schema
    intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), t)
    }
    assert(Snapshots.schemaOf(spark, t, 2).exists(_.contains("extra")))
  }

  test("deleteWhere: hit dirs rewrite, others carry by reference, history intact") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t)
    Snapshots.commit(Seq((3L, 30L), (4L, 40L)).toDF("id", "v"), t)
    Snapshots.commit(Seq((5L, 50L), (6L, 60L)).toDF("id", "v"), t)
    val preFiles = Snapshots.read(spark, t, Some(3)).inputFiles.toSet
    // predicate hits ONLY the second commit's rows
    val (v, carried, rewritten) =
      Snapshots.deleteWhere(spark, t, col("id") === 3L)
    assert((v, carried, rewritten) == ((4, 2, 1)))
    val post = Snapshots.read(spark, t, Some(4))
    assert(post.orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 20L), (4L, 40L), (5L, 50L), (6L, 60L)))
    // commits 1 and 3's files appear VERBATIM in the new version's scan
    val postFiles = post.inputFiles.toSet
    assert((preFiles intersect postFiles).nonEmpty)
    assert((postFiles -- preFiles).nonEmpty) // the rewrite
    // every historical version still reproduces its full state
    assert(Snapshots.read(spark, t, Some(3)).count() == 6)
    assert(Snapshots.read(spark, t, Some(2)).count() == 4)
  }

  test("deleteWhere: nothing matched publishes nothing") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, 10L)).toDF("id", "v"), t)
    val (v, carried, rewritten) =
      Snapshots.deleteWhere(spark, t, col("id") === 999L)
    assert((v, carried, rewritten) == ((1, 1, 0)))
    assert(Snapshots.latestVersion(spark, t) == 1)
  }

  test("deleteWhere: predicate spanning every dir rewrites everything") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t)
    Snapshots.commit(Seq((3L, 30L), (4L, 40L)).toDF("id", "v"), t)
    val (v, carried, rewritten) =
      Snapshots.deleteWhere(spark, t, col("id") % 2 === 0L)
    assert((v, carried, rewritten) == ((3, 0, 2)))
    assert(Snapshots.read(spark, t).orderBy("id").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 10L), (3L, 30L)))
  }

  test("compactSmall: small dirs fold into one, big dirs carry, rows identical") {
    import spark.implicits._
    val t = freshTable()
    // one BIG commit (1000 rows) + three tiny ones
    Snapshots.commit((1L to 1000L).map(i => (i, i * 2)).toDF("id", "v"), t)
    Snapshots.commit(Seq((2001L, 1L)).toDF("id", "v"), t)
    Snapshots.commit(Seq((2002L, 2L)).toDF("id", "v"), t)
    Snapshots.commit(Seq((2003L, 3L)).toDF("id", "v"), t)
    val before = Snapshots.read(spark, t, Some(4))
    val beforeRows = before.orderBy("id").collect().map(_.toSeq).toSeq
    val beforeFiles = before.inputFiles.length
    // threshold sized between a tiny dir and the big one
    val bigDirBytes = {
      val p = new org.apache.hadoop.fs.Path(t)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.listStatus(new org.apache.hadoop.fs.Path(s"$t/data"))
        .map(st => f.getContentSummary(st.getPath).getLength).max
    }
    val (v, nCompacted, nCarried) =
      Snapshots.compactSmall(spark, t, smallBytes = bigDirBytes)
    assert((v, nCompacted, nCarried) == ((5, 3, 1)))
    val after = Snapshots.read(spark, t, Some(5))
    assert(after.orderBy("id").collect().map(_.toSeq).toSeq == beforeRows)
    assert(after.inputFiles.length < beforeFiles)
    // pre-compaction version still time-travels
    assert(Snapshots.read(spark, t, Some(4)).count() == 1003)
    // fewer than 2 qualifying dirs -> no-op (the 3 tiny dirs are one now)
    val (v2, c2, k2) = Snapshots.compactSmall(spark, t, smallBytes = 1L)
    assert((v2, c2, k2) == ((5, 0, 2)))
  }

  test("commitWithStats + readPruned: prune by range, statless dirs always read") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commitWithStats(Seq((1L, "a"), (5L, "b")).toDF("k", "s"), t, "k")
    Snapshots.commitWithStats(Seq((10L, "c"), (15L, "d")).toDF("k", "s"), t, "k")
    Snapshots.commit(Seq((100L, "z")).toDF("k", "s"), t) // NO stats line
    // range [9, 20]: dir1's [1,5] is provably out; dir2 hits; the
    // statless dir must always read (pruning is advisory, never lossy)
    val scan = Snapshots.readPruned(spark, t, "k", 9L, 20L)
    assert((scan.dirsTotal, scan.dirsRead) == ((3, 2)))
    assert(scan.df.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((10L, "c"), (15L, "d")))
    // a range no stats admit: only the statless dir opens, residual
    // filter still makes the answer exact
    val s2 = Snapshots.readPruned(spark, t, "k", 200L, 300L)
    assert((s2.dirsTotal, s2.dirsRead) == ((3, 1)) && s2.df.count() == 0)
    // stats lines carried forward: time-travel to v2 prunes too
    val s3 = Snapshots.readPruned(spark, t, "k", 1L, 5L, Some(2))
    assert((s3.dirsTotal, s3.dirsRead) == ((2, 1)))
    assert(s3.df.count() == 2)
  }

  test("commitWithMultiStats + readPrunedMulti: any one disjoint dimension " +
      "skips; partial stats admit; conjunctive residual stays exact") {
    import spark.implicits._
    val t = freshTable()
    // dir1: x in [0,9],   y in [0,9]
    // dir2: x in [0,9],   y in [100,109]
    // dir3: x in [100,109], y in [0,9]
    // dir4: stats on x ONLY (null y column) -> y-predicate cannot prune it
    def frame(rows: (Long, Option[Long], String)*) =
      rows.toDF("x", "y", "s") // y Option -> nullable in EVERY commit
    Snapshots.commitWithMultiStats(
      frame((0L, Some(0L), "a"), (9L, Some(9L), "b")), t, Seq("x", "y"))
    Snapshots.commitWithMultiStats(
      frame((0L, Some(100L), "c"), (9L, Some(109L), "d")), t, Seq("x", "y"))
    Snapshots.commitWithMultiStats(
      frame((100L, Some(0L), "e"), (109L, Some(9L), "f")), t, Seq("x", "y"))
    Snapshots.commitWithMultiStats(
      frame((5L, None, "g")), t, Seq("x"))
    // dir5: y all-null WITH declared y stats -> the EMPTY-SET sentinel
    // line [0,-1] makes any y-value predicate provably disjoint
    Snapshots.commitWithMultiStats(
      frame((6L, None, "h")), t, Seq("x", "y"))
    // box x in [0,9] AND y in [0,9]: dir2 pruned on y, dir3 pruned on
    // x, dir4 admitted (NO y stats -> advisory), dir5 pruned (its y
    // sentinel proves the empty value set), dir1 admitted
    val scan = Snapshots.readPrunedMulti(spark, t,
      Seq(("x", 0L, 9L), ("y", 0L, 9L)))
    assert((scan.dirsTotal, scan.dirsRead) == ((5, 2)))
    // residual is the FULL conjunction: dir4's null-y row is filtered out
    assert(scan.df.select("s").orderBy("s").as[String].collect().toSeq ==
      Seq("a", "b"))
    // single-dimension box through the multi reader == readPruned
    val sx = Snapshots.readPrunedMulti(spark, t, Seq(("x", 100L, 109L)))
    assert((sx.dirsTotal, sx.dirsRead) == ((5, 1)) && sx.df.count() == 2)
    // nothing admitted (dirs 4 and 5 have x stats, so the x-predicate
    // prunes them even without/with sentinel y) -> schema-only empty
    val s0 = Snapshots.readPrunedMulti(spark, t,
      Seq(("x", 50L, 60L), ("y", 50L, 60L)))
    assert((s0.dirsTotal, s0.dirsRead) == ((5, 0)))
    assert(s0.df.count() == 0 && s0.df.columns.toSeq == Seq("x", "y", "s"))
  }

  test("deleteWhereMoR: tombstones hide keys without rewriting data dirs, " +
      "carry through commits/compaction, and survive vacuum") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 6L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    Snapshots.commit((7L to 12L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    val dirsBefore = Snapshots.dataDirsOf(spark, t, 2)
    val (v3, n) = Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 3 === 0)
    assert(v3 == 3 && n == 4) // 3, 6, 9, 12
    // no data dir rewritten; reads hide the keys; history intact
    assert(Snapshots.dataDirsOf(spark, t, 3) == dirsBefore)
    assert(Snapshots.read(spark, t).select("k").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L))
    assert(Snapshots.read(spark, t, Some(2)).count() == 12)
    // dv-aware matching: repeat delete no-ops at the same version
    assert(Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 3 === 0)
      == ((3, 0L)))
    // a later commit carries the dv: fresh keys visible, tombstones not
    Snapshots.commit(Seq((100L, "new")).toDF("k", "s"), t)
    assert(Snapshots.read(spark, t, Some(4)).select("k").as[Long]
      .collect().sorted.toSeq
      == Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L, 100L))
    // key-tombstone semantics: re-inserting a deleted key stays hidden
    Snapshots.commit(Seq((3L, "again")).toDF("k", "s"), t)
    assert(!Snapshots.read(spark, t, Some(5)).select("k").as[Long]
      .collect().contains(3L))
    // compaction carries the dv line: rows stay invisible even though
    // the compacted directory physically holds them
    val (v6, nComp, _) = Snapshots.compactSmall(spark, t, smallBytes = 1L << 30)
    assert(v6 == 6 && nComp >= 2)
    assert(Snapshots.read(spark, t, Some(6)).select("k").as[Long]
      .collect().sorted.toSeq
      == Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L, 100L))
    // vacuum keeps the dv dir referenced by retained manifests
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    assert(Snapshots.read(spark, t).select("k").as[Long]
      .collect().sorted.toSeq
      == Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L, 100L))
    // MATERIALIZE folds the tombstones into a survivor rewrite, drops
    // the #dv lines, and lifts the re-insert suppression
    val (v7, _, rewr) = Snapshots.materializeDeletes(spark, t)
    assert(v7 == 7 && rewr >= 1)
    assert(Snapshots.read(spark, t, Some(7)).select("k").as[Long]
      .collect().sorted.toSeq
      == Seq(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L, 100L))
    // no dv lines remain -> repeat materialize no-ops
    assert(Snapshots.materializeDeletes(spark, t)._1 == 7)
    // re-inserting a formerly tombstoned key is now visible
    Snapshots.commit(Seq((3L, "back")).toDF("k", "s"), t)
    assert(Snapshots.read(spark, t, Some(8)).filter(col("k") === 3L).count() == 1)
  }

  test("readPruned: zero admitted dirs yields an empty frame, schema intact") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commitWithStats(Seq((1L, "a")).toDF("k", "s"), t, "k")
    Snapshots.commitWithStats(Seq((9L, "b")).toDF("k", "s"), t, "k")
    val scan = Snapshots.readPruned(spark, t, "k", 100L, 200L)
    assert((scan.dirsTotal, scan.dirsRead) == ((2, 0)))
    assert(scan.df.columns.toSeq == Seq("k", "s") && scan.df.count() == 0)
  }

  test("txn tags survive vacuum + maintenance rewrites: replay stays closed") {
    import spark.implicits._
    val t = freshTable()
    assert(Snapshots.commitIfAbsent(
      Seq((1L, "a")).toDF("id", "s"), t, "w", 0L).contains(1))
    assert(Snapshots.commitIfAbsent(
      Seq((2L, "b")).toDF("id", "s"), t, "w", 1L).contains(2))
    // maintenance rewrite folds both commits into one directory (v3),
    // then vacuum expires every pre-compaction manifest — the manifests
    // that FIRST recorded the tags are gone
    Snapshots.compactSmall(spark, t, smallBytes = 1L << 40)
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    // the carried tags in v3 must still refuse both replays
    assert(Snapshots.commitIfAbsent(
      Seq((1L, "a")).toDF("id", "s"), t, "w", 0L).isEmpty)
    assert(Snapshots.commitIfAbsent(
      Seq((2L, "b")).toDF("id", "s"), t, "w", 1L).isEmpty)
    // a genuinely new batch still lands, and carries the tags onward
    assert(Snapshots.commitIfAbsent(
      Seq((3L, "c")).toDF("id", "s"), t, "w", 2L).contains(4))
    assert(Snapshots.read(spark, t).count() == 3)
    assert(Snapshots.commitIfAbsent(
      Seq((3L, "c")).toDF("id", "s"), t, "w", 2L).isEmpty)
  }

  test("changeFeed: folding insert − delete over every version " +
      "reconstructs read(latest); maintenance emits nothing") {
    import spark.implicits._
    val t = freshTable()
    // v1, v2: appends
    Snapshots.commit((1L to 6L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    Snapshots.commit((7L to 12L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    // v3: MoR delete of multiples of 3 (4 keys)
    val (v3, nDel) = Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 3 === 0)
    assert(v3 == 3 && nDel == 4)
    // v4: compaction — bytes move, rows don't
    val (v4, nComp, _) = Snapshots.compactSmall(spark, t, smallBytes = 1L << 30)
    assert(v4 == 4 && nComp >= 2)
    // v5: CoW delete of k = 2 (sidecar-captured preimage)
    val (v5, _, rewr) = Snapshots.deleteWhere(spark, t, col("k") === 2L)
    assert(v5 == 5 && rewr >= 1)
    // v6: append, including a RE-INSERT of tombstoned key 3 — invisible
    // under the carried dv, so the feed must exclude it
    Snapshots.commit(Seq((3L, "again"), (100L, "new")).toDF("k", "s"), t)

    val feed = Snapshots.changeFeed(spark, t, 1, 6).cache()
    // per-version shape
    val byV = feed.groupBy("_commit_version", "_change_type").count()
      .as[(Int, String, Long)].collect()
      .map { case (v, c, n) => (v, c) -> n }.toMap
    assert(byV((1, "insert")) == 6 && byV((2, "insert")) == 6)
    assert(byV((3, "delete")) == 4)       // preimage rows of the 4 keys
    assert(!byV.keySet.exists(_._1 == 4)) // compaction: zero feed rows
    assert(byV((5, "delete")) == 1)       // the CoW sidecar row
    assert(byV((6, "insert")) == 1)       // re-inserted key 3 excluded
    // the MoR preimage is the ROWS, not just keys
    assert(feed.filter($"_commit_version" === 3).select("k", "s")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
      == Seq(3L, 6L, 9L, 12L).map(k => (k, s"r$k")))
    // fold law: inserts minus deletes == read(latest), bit-for-bit
    val folded = feed.filter($"_change_type" === "insert")
      .select("k", "s")
      .join(feed.filter($"_change_type" === "delete").select("k"),
        Seq("k"), "left_anti")
    val live = Snapshots.read(spark, t, Some(6)).select("k", "s")
    assert(folded.exceptAll(live).isEmpty && live.exceptAll(folded).isEmpty)
    // the cdf sidecar survives a vacuum that retains its version
    Snapshots.vacuum(spark, t, keepVersions = 2, orphanGraceMs = 0L)
    assert(Snapshots.changeFeed(spark, t, 5, 6)
      .filter($"_change_type" === "delete").count() == 1)
    // a pre-provenance manifest (no #change line) fails loudly
    val m1 = java.nio.file.Paths.get(s"$t/manifest-v5.txt")
    val stripped = new String(java.nio.file.Files.readAllBytes(m1), "UTF-8")
      .linesIterator.filterNot(_.startsWith("#change ")).mkString("\n")
    java.nio.file.Files.write(m1, stripped.getBytes("UTF-8"))
    intercept[RuntimeException] { Snapshots.changeFeed(spark, t, 5, 6) }
  }

  test("renameColumn: metadata-only, mixed-dir reads coalesce, pruning " +
      "stats re-key, time travel keeps the old contract") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commitWithStats(Seq((1L, 10L), (2L, 20L)).toDF("k", "amt"),
      t, "amt")
    Snapshots.commitWithStats(Seq((3L, 900L)).toDF("k", "amt"), t, "amt")
    val dirsBefore = Snapshots.dataDirsOf(spark, t, 2)
    val v3 = Snapshots.renameColumn(spark, t, "amt", "amount_cents")
    // zero data movement; the read contract flips; history keeps the old
    assert(v3 == 3 && Snapshots.dataDirsOf(spark, t, 3) == dirsBefore)
    assert(Snapshots.read(spark, t).columns.toSeq == Seq("k", "amount_cents"))
    assert(Snapshots.read(spark, t, Some(2)).columns.toSeq == Seq("k", "amt"))
    // post-rename commits write the NEW name; mixed dirs coalesce to one
    Snapshots.commitWithStats(Seq((4L, 40L)).toDF("k", "amount_cents"), t,
      "amount_cents")
    assert(Snapshots.read(spark, t).select("amount_cents").as[Long]
      .collect().sorted.toSeq == Seq(10L, 20L, 40L, 900L))
    // pruning stats re-keyed: the 900 dir admits, the 10/20 dir skips
    val scan = Snapshots.readPruned(spark, t, "amount_cents", 100L, 1000L)
    assert(scan.dirsRead < scan.dirsTotal &&
      scan.df.select("amount_cents").as[Long].collect().toSeq == Seq(900L))
    // guard rails: re-introducing the old name / renaming onto a live
    // name both refuse loudly
    intercept[IllegalArgumentException] {
      Snapshots.commit(Seq((9L, 1L)).toDF("k", "amt"), t)
    }
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, t, "k", "amount_cents")
    }
    // compaction normalizes old dirs to the new physical name
    val (v5, nComp, _) = Snapshots.compactSmall(spark, t, smallBytes = 1L << 30)
    assert(v5 == 5 && nComp >= 2)
    assert(Snapshots.read(spark, t).agg(sum("amount_cents")).head.getLong(0)
      == 970L)
    // rename CHAIN back to the original name converges (a→b, b→a)
    val v6 = Snapshots.renameColumn(spark, t, "amount_cents", "amt")
    assert(v6 == 6 && Snapshots.read(spark, t).columns.toSeq == Seq("k", "amt"))
    assert(Snapshots.read(spark, t).agg(sum("amt")).head.getLong(0) == 970L)
  }

  test("renameColumn: dv key column refuses while tombstones live; " +
      "changeFeed spans a rename under the current contract") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 6L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 3 === 0)
    intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, t, "k", "key")
    }
    // a non-key column renames fine even with live tombstones
    val v3 = Snapshots.renameColumn(spark, t, "v", "val")
    assert(v3 == 3)
    assert(Snapshots.read(spark, t).select("k", "val").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
      == Seq(1L -> 10L, 2L -> 20L, 4L -> 40L, 5L -> 50L))
    Snapshots.commit(Seq((7L, 70L)).toDF("k", "val"), t)
    // the feed spans the rename: v1 inserts emit under the NEW name,
    // the rename version emits nothing, fold == read(latest)
    val feed = Snapshots.changeFeed(spark, t, 1, 4)
    assert(feed.columns.contains("val") && !feed.columns.contains("v"))
    assert(feed.filter(col("_commit_version") === 3).count() == 0)
    val folded = feed.filter(col("_change_type") === "insert")
      .select("k", "val")
      .join(feed.filter(col("_change_type") === "delete").select("k"),
        Seq("k"), "left_anti")
    val live = Snapshots.read(spark, t).select("k", "val")
    assert(folded.exceptAll(live).isEmpty && live.exceptAll(folded).isEmpty)
  }

  test("optimizeClustered: fixed Morton chunks with tight stats, row " +
      "multiset unchanged, dv carries, feed emits nothing") {
    import spark.implicits._
    val t = freshTable()
    // two interleaved commits spanning the full 8×8 grid
    val pts = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y, x * 8 + y)
    val (a, b) = pts.partition { case (x, y, _) => (x + y) % 2 == 0 }
    Snapshots.commitWithMultiStats(a.toDF("x", "y", "v"), t, Seq("x", "y"))
    Snapshots.commitWithMultiStats(b.toDF("x", "y", "v"), t, Seq("x", "y"))
    // tombstone one key; the optimize must keep it suppressed
    Snapshots.deleteWhereMoR(spark, t, "v", col("v") === 0L)
    val beforeRows = Snapshots.read(spark, t).select("v").as[Long]
      .collect().sorted.toSeq
    val before = Snapshots.readPrunedMulti(spark, t,
      Seq(("x", 0L, 1L), ("y", 0L, 1L)))
    assert(before.dirsRead == before.dirsTotal) // interleave defeats stats
    val (v4, nChunks) = Snapshots.optimizeClustered(spark, t,
      Seq("x", "y"), 3, 4)
    assert(v4 == 4 && nChunks == 4) // 8×8 grid → 4 non-empty 16-wide chunks
    // same rows (dv still suppressing v=0), tighter layout
    assert(Snapshots.read(spark, t).select("v").as[Long]
      .collect().sorted.toSeq == beforeRows)
    val after = Snapshots.readPrunedMulti(spark, t,
      Seq(("x", 0L, 1L), ("y", 0L, 1L)))
    assert(after.dirsRead < after.dirsTotal)
    assert(after.df.count() == before.df.count())
    // maintenance provenance: the feed emits nothing for the optimize
    assert(Snapshots.changeFeed(spark, t, 4, 4).count() == 0)
  }

  test("write-audit-publish: staged batches invisible, vacuum-safe, " +
      "abandon zero-trace, publish is an ordinary append") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), t)
    val sid = Snapshots.commitStaged(Seq((3L, -5L)).toDF("k", "v"), t)
    // invisible to readers; visible to the audit
    assert(Snapshots.read(spark, t).count() == 2)
    assert(Snapshots.readStaged(spark, t, sid).count() == 3)
    assert(Snapshots.readStaged(spark, t, sid)
      .filter(col("v") < 0).count() == 1) // the audit catches it
    // vacuum with zero grace spares the marker-referenced dir
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    assert(Snapshots.readStaged(spark, t, sid).count() == 3)
    Snapshots.abandonStaged(spark, t, sid)
    assert(Snapshots.latestVersion(spark, t) == 1)
    intercept[IllegalArgumentException] {
      Snapshots.readStaged(spark, t, sid)
    }
    // after abandon, a zero-grace vacuum leaves no staged orphan behind
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    // clean batch: stage → audit → publish; schema drift refuses at stage
    intercept[IllegalArgumentException] {
      Snapshots.commitStaged(Seq((9L, "wrong")).toDF("k", "v"), t)
    }
    val s2 = Snapshots.commitStaged(Seq((3L, 30L)).toDF("k", "v"), t)
    assert(Snapshots.publishStaged(spark, t, s2) == 2)
    assert(Snapshots.read(spark, t).select("v").as[Long]
      .collect().sorted.toSeq == Seq(10L, 20L, 30L))
    // the marker is consumed: a second publish of the same stage refuses
    intercept[IllegalArgumentException] {
      Snapshots.publishStaged(spark, t, s2)
    }
    // provenance: the published version feeds as an ordinary append
    assert(Snapshots.changeFeed(spark, t, 2, 2)
      .select("k").as[Long].collect().toSeq == Seq(3L))
  }

  test("tags: pin versions through vacuum, immutable until dropped") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("k", "s"), t)
    Snapshots.tagVersion(spark, t, "v1.0", 1)
    Snapshots.commit(Seq((2L, "b")).toDF("k", "s"), t)
    Snapshots.commit(Seq((3L, "c")).toDF("k", "s"), t)
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    // the tagged v1 survives a retention-1 vacuum; untagged v2 is gone
    assert(Snapshots.resolveTag(spark, t, "v1.0") == 1)
    assert(Snapshots.read(spark, t, Some(1)).count() == 1)
    intercept[Exception] { Snapshots.read(spark, t, Some(2)).count() }
    assert(Snapshots.read(spark, t).count() == 3) // latest intact
    // immutability + bad names refuse
    intercept[IllegalArgumentException] {
      Snapshots.tagVersion(spark, t, "v1.0", 3)
    }
    intercept[IllegalArgumentException] {
      Snapshots.tagVersion(spark, t, "bad name", 3)
    }
    assert(Snapshots.tagsOf(spark, t) == Map("v1.0" -> 1))
    // dropping the tag releases the pin
    Snapshots.dropTag(spark, t, "v1.0")
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    intercept[Exception] { Snapshots.read(spark, t, Some(1)).count() }
    assert(Snapshots.tagsOf(spark, t).isEmpty)
  }

  test("optimizeClustered races a concurrent commit: both land, " +
      "no rows lost, CAS arbitration serializes them") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val t = freshTable()
    val pts = (0L until 64L).map(i => (i % 8, i / 8, i))
    Snapshots.commitWithMultiStats(
      pts.take(32).toDF("x", "y", "v"), t, Seq("x", "y"))
    Snapshots.commitWithMultiStats(
      pts.drop(32).toDF("x", "y", "v"), t, Seq("x", "y"))
    val fOpt = Future(Snapshots.optimizeClustered(spark, t, Seq("x", "y"), 3, 4))
    val fCommit = Future(Snapshots.commit(
      Seq((0L, 0L, 999L)).toDF("x", "y", "v"), t))
    val (vo, _) = Await.result(fOpt, 120.seconds)
    val vc = Await.result(fCommit, 120.seconds)
    // both claimed distinct versions; nothing clobbered
    assert(Set(vo, vc).size == 2 && Snapshots.latestVersion(spark, t) == 4)
    assert(Snapshots.read(spark, t).select("v").as[Long]
      .collect().sorted.toSeq == ((0L until 64L) :+ 999L).sorted)
  }

  test("changeFeed append reads ONLY the version's new directory — " +
      "the O(delta) promise, pinned on the scan's file list") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 100L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    Snapshots.commit((101L to 200L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    Snapshots.commit(Seq((201L, "x")).toDF("k", "s"), t)
    val v1dirs = Snapshots.dataDirsOf(spark, t, 1)
    val v3only = Snapshots.dataDirsOf(spark, t, 3)
      .filterNot(Snapshots.dataDirsOf(spark, t, 2).toSet)
    assert(v3only.size == 1)
    val feed3 = Snapshots.changeFeed(spark, t, 3, 3)
    assert(feed3.count() == 1)
    // the scan's concrete file list: every file under the v3 dir, none
    // under the older ones
    val files = feed3.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(v3only.head)),
      s"feed of v3 scans beyond its new dir — O(table), not O(delta): " +
        files.mkString(", "))
    assert(!v1dirs.exists(d => files.exists(_.contains(d))),
      s"feed of v3 scans v1 data: ${files.mkString(", ")}")
  }

  test("vacuum reaps a crashed optimize's staging dir after the grace window") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("k", "s"), t)
    // simulate the crash: staging dir written, no manifest ever claimed
    Seq((9L, "junk")).toDF("k", "s").write.parquet(s"$t/.opt-deadbeef/c=0")
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 1L << 40)
    assert(new java.io.File(s"$t/.opt-deadbeef").exists()) // grace spares
    val (_, n) = Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    assert(n >= 1 && !new java.io.File(s"$t/.opt-deadbeef").exists())
    assert(Snapshots.read(spark, t).count() == 1) // table untouched
  }

  test("changeFeed fold law holds under randomized operation sequences") {
    import spark.implicits._
    // seeded generator: flat appends, HIVE-PARTITIONED appends (spec
    // evolution mid-chain), MoR deletes, CoW deletes, MERGE upserts
    // (update a live slice + fresh inserts), compactions,
    // materializations in arbitrary interleavings — after EVERY step,
    // the LAST-WRITER-WINS fold of the whole feed must reconstruct
    // read(latest) bit-for-bit across mixed directory layouts. (Keys
    // are unique and never re-inserted after deletion, so per key the
    // newest event decides: insert ⇒ that row lives, delete ⇒ gone;
    // within a merge version the insert outranks its paired preimage
    // delete.)
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(seed)
      val t = freshTable()
      val rep = s"${t}_rep"
      var nextId = 0L
      def freshRows(n: Int) = {
        val rows = (nextId until nextId + n)
          .map(k => (k, s"p${k % 3}", k * 10L))
        nextId += n
        // nullable schema: merge sources derive from read-back frames
        // (parquet loosens NOT NULL), so the CONTRACT must be nullable
        // for the strict merge schema check to compose
        val df = rows.toDF("k", "g", "v")
        spark.createDataFrame(df.rdd,
          org.apache.spark.sql.types.StructType(
            df.schema.map(_.copy(nullable = true))))
      }
      Snapshots.commit(freshRows(20), t)
      for (_ <- 1 to 6) {
        rnd.nextInt(9) match {
          case 0 => Snapshots.commit(freshRows(5 + rnd.nextInt(10)), t): Unit
          case 1 | 6 => Snapshots.commitPartitioned(
            freshRows(5 + rnd.nextInt(10)), t, Seq("g")): Unit
          case 2 =>
            Snapshots.deleteWhereMoR(spark, t, "k",
              col("k") % (3 + rnd.nextInt(4)) === rnd.nextInt(3)): Unit
          case 3 =>
            Snapshots.deleteWhere(spark, t,
              col("k") % (3 + rnd.nextInt(4)) === rnd.nextInt(3)): Unit
          case 4 =>
            Snapshots.compactSmall(spark, t, smallBytes = 1L << 30): Unit
          case 5 =>
            Snapshots.materializeDeletes(spark, t): Unit
          case 7 =>
            // merge: rewrite a live slice's values + insert fresh keys
            // (dv guard satisfied by materializing first — itself an op)
            Snapshots.materializeDeletes(spark, t): Unit
            val updates = Snapshots.read(spark, t).select("k", "g")
              .filter(col("k") % 5 === rnd.nextInt(5))
              .withColumn("v", col("k") * 100L + 7L)
            Snapshots.mergeUpsert(spark, t,
              updates.unionByName(freshRows(3 + rnd.nextInt(4))), "k"): Unit
          case 8 =>
            // restore to a random earlier version (dv guard at head
            // satisfied by materializing first); a dv-carrying TARGET
            // refuses — that refusal path is part of the op's surface,
            // so swallow exactly it and let the interleaving continue
            Snapshots.materializeDeletes(spark, t): Unit
            val head = Snapshots.latestVersion(spark, t)
            if (head >= 2) {
              val target = 1 + rnd.nextInt(head - 1)
              try Snapshots.restoreTo(spark, t, target): Unit
              catch {
                case e: IllegalArgumentException
                    if e.getMessage.contains("deletion vectors") => ()
              }
            }
        }
        val latest = Snapshots.latestVersion(spark, t)
        val feed = Snapshots.changeFeed(spark, t, 1, latest)
        val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
          .orderBy(desc("_commit_version"),
            when(col("_change_type") === "insert", 1).otherwise(0).desc)
        val folded = feed
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rn") === 1 && col("_change_type") === "insert")
          .select("k", "g", "v")
        val live = Snapshots.read(spark, t).select("k", "g", "v")
        assert(folded.exceptAll(live).isEmpty && live.exceptAll(folded).isEmpty,
          s"fold law broke at seed=$seed v$latest")
        // the feed's flagship consumer rides the same interleavings: a
        // replica synced after EVERY op must equal the source exactly —
        // replication × partition evolution × merge × both delete paths
        // × maintenance, composed under randomization
        graft.streaming.ChangeFeedSync.replicateOnce(spark, t, rep, "k")
        val repDf = Snapshots.read(spark, rep).select("k", "g", "v")
        assert(repDf.exceptAll(live).isEmpty && live.exceptAll(repDf).isEmpty,
          s"replica diverged at seed=$seed v$latest")
      }
    }
  }

  test("savepoint: captures all tables, rolls back its own tags on a " +
      "partial failure, leaves pre-existing tags untouched") {
    import spark.implicits._
    val t1 = freshTable()
    val t2 = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("k", "s"), t1)
    Snapshots.commit(Seq((2L, "b")).toDF("k", "s"), t2)
    // happy path: one name captures both
    assert(Snapshots.savepoint(spark, Seq(t1, t2), "rec")
      == Map(t1 -> 1, t2 -> 1))
    assert(Snapshots.readAt(spark, t1, "rec").count() == 1)
    // partial failure: ONLY t2 already holds "rec2", so t1's claim
    // succeeds first and t2's refusal must roll t1's fresh tag back
    Snapshots.commit(Seq((3L, "c")).toDF("k", "s"), t1)
    Snapshots.commit(Seq((4L, "d")).toDF("k", "s"), t2)
    Snapshots.tagVersion(spark, t2, "rec2", 2)
    intercept[IllegalArgumentException] {
      Snapshots.savepoint(spark, Seq(t1, t2), "rec2")
    }
    // t1 carries ONLY the original savepoint tag (the rec2 claim
    // rolled back); t2's pre-existing tags are untouched
    assert(Snapshots.tagsOf(spark, t1) == Map("rec" -> 1))
    assert(Snapshots.tagsOf(spark, t2) == Map("rec" -> 1, "rec2" -> 2))
  }

  test("latestVersion recovers from a crashed hint write") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a")).toDF("id", "s"), t)
    Snapshots.commit(Seq((2L, "b")).toDF("id", "s"), t)
    // simulate a writer that claimed manifest-v2 but died before the
    // hint write: regress the hint to 1
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$t/_latest"),
      "1".getBytes("UTF-8"))
    // the listing reconciliation still reports — and reads — v2
    assert(Snapshots.latestVersion(spark, t) == 2)
    assert(Snapshots.read(spark, t).count() == 2)
  }

  test("changeFeed replays an append that carried live dv lines even " +
      "after the dv key column was materialized away and renamed") {
    import spark.implicits._
    val t = freshTable()
    // v1 append; v2 MoR-delete (live #dv on 'k'); v3 append — its
    // manifest CARRIES the #dv lines under the old physical key name
    Snapshots.commit((1L to 6L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    val (v2, nDel) = Snapshots.deleteWhereMoR(spark, t, "k", col("k") <= 2L)
    assert(v2 == 2 && nDel == 2)
    Snapshots.commit(Seq((1L, "re"), (10L, "new")).toDF("k", "s"), t)
    // v4 materialize (unblocks the rename), v5 rename k -> key
    val (v4, _, _) = Snapshots.materializeDeletes(spark, t)
    assert(v4 == 4)
    assert(Snapshots.renameColumn(spark, t, "k", "key") == 5)
    // replaying the WHOLE range must not throw: v3's append branch
    // applies its era's dv (physical name 'k') on the raw read BEFORE
    // folding toV's rename mapping
    val feed = Snapshots.changeFeed(spark, t, 1, 5).cache()
    assert(feed.columns.contains("key") && !feed.columns.contains("k"))
    // v3's insert excludes re-inserted tombstoned key 1
    assert(feed.filter($"_commit_version" === 3).select("key")
      .as[Long].collect().sorted.toSeq == Seq(10L))
    // fold law still reconstructs the live view across the rename
    val folded = feed.filter($"_change_type" === "insert").select("key", "s")
      .join(feed.filter($"_change_type" === "delete").select("key"),
        Seq("key"), "left_anti")
    val live = Snapshots.read(spark, t, Some(5)).select("key", "s")
    assert(folded.exceptAll(live).isEmpty && live.exceptAll(folded).isEmpty)
  }

  test("publishStaged into an empty table records the stage-time schema " +
      "contract, not the nullable-loosened parquet read-back") {
    import spark.implicits._
    val t = freshTable()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s") // id: BIGINT NOT NULL
    assert(df.schema("id").nullable == false)
    val id = Snapshots.commitStaged(df, t)
    assert(Snapshots.publishStaged(spark, t, id) == 1)
    // v1's contract carries NOT NULL from stage time
    assert(Snapshots.schemaOf(spark, t, 1).exists(_.contains("NOT NULL")))
    // so the producer's next commit of the SAME shape is not refused
    assert(Snapshots.commit(Seq((3L, "c")).toDF("id", "s"), t) == 2)
    assert(Snapshots.read(spark, t).count() == 3)
  }

  test("mergeUpsert: matched rows replaced, fresh keys appended, " +
      "untouched dirs carry, feed emits only changed rows") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 10L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    Snapshots.commit((11L to 20L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    // updates hit ONLY the second dir (keys 15..18); 3 fresh keys insert
    val src = ((15L to 18L).map(k => (k, s"u$k")) ++
      (100L to 102L).map(k => (k, s"n$k"))).toDF("k", "s")
    val (v3, nUpd, nIns) = Snapshots.mergeUpsert(spark, t, src, "k")
    assert(v3 == 3 && nUpd == 4 && nIns == 3)
    val got = Snapshots.read(spark, t).as[(Long, String)].collect().toMap
    assert(got.size == 23 && got(15L) == "u15" && got(1L) == "r1" &&
      got(20L) == "r20" && got(100L) == "n100")
    // the un-hit first dir carried by reference (O(affected files))
    val sharedDirs = Snapshots.dataDirsOf(spark, t, 3).toSet
      .intersect(Snapshots.dataDirsOf(spark, t, 2).toSet)
    assert(sharedDirs.size == 1, s"expected 1 carried dir, got $sharedDirs")
    // feed: exactly the 4 preimages as deletes + 7 postimages as inserts
    val feed = Snapshots.changeFeed(spark, t, 3, 3).cache()
    assert(feed.filter($"_change_type" === "delete").select("k", "s")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      (15L to 18L).map(k => (k, s"r$k")))
    assert(feed.filter($"_change_type" === "insert").count() == 7)
    // fold law across the whole history
    val all = Snapshots.changeFeed(spark, t, 1, 3).cache()
    val folded = all.filter($"_change_type" === "insert").select("k", "s")
      .join(all.filter($"_change_type" === "delete")
        .select($"k", $"s".as("ds")), Seq("k"), "left_outer")
      .filter($"ds".isNull || $"s" =!= $"ds").select("k", "s")
    val live = Snapshots.read(spark, t).select("k", "s")
    assert(folded.exceptAll(live).isEmpty && live.exceptAll(folded).isEmpty)
    // guards: non-key-unique source; live deletion vectors
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "s")
    val e1 = intercept[IllegalArgumentException](
      Snapshots.mergeUpsert(spark, t, dup, "k"))
    assert(e1.getMessage.contains("key-unique"))
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") === 2L)
    val e2 = intercept[IllegalArgumentException](
      Snapshots.mergeUpsert(spark, t, src, "k"))
    assert(e2.getMessage.contains("deletion vectors"))
  }

  test("mergeUpsert races a concurrent append: both land, the merge " +
      "recomputes against the new chain, no rows lost") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 20L).map(k => (k, s"r$k")).toDF("k", "s"), t)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val merge = Future {
      Snapshots.mergeUpsert(spark, t,
        ((5L to 10L).map(k => (k, s"u$k")) ++
          (100L to 102L).map(k => (k, s"n$k"))).toDF("k", "s"), "k")
    }
    val append = Future {
      Snapshots.commit((200L to 204L).map(k => (k, s"a$k")).toDF("k", "s"), t)
    }
    val (mv, nUpd, nIns) = Await.result(merge, 300.seconds)
    val av = Await.result(append, 300.seconds)
    // CAS serialized them into versions 2 and 3, in either order
    assert(Set(mv, av) == Set(2, 3) && nUpd == 6 && nIns == 3)
    val got = Snapshots.read(spark, t).as[(Long, String)].collect().toMap
    assert(got.size == 28, s"expected 28 rows, got ${got.size}")
    assert(got(5L) == "u5" && got(1L) == "r1" && got(100L) == "n100" &&
      got(200L) == "a200")
    // the fold law survives the interleaving (merge may have recomputed)
    val feed = Snapshots.changeFeed(spark, t, 1, 3)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(desc("_commit_version"),
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val folded = feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("_change_type") === "insert")
      .select("k", "s")
    val live = Snapshots.read(spark, t).select("k", "s")
    assert(folded.exceptAll(live).isEmpty && live.exceptAll(folded).isEmpty)
  }

  test("applyChangesCow: delete + merge land as ONE version; untouched " +
      "dirs carry by reference; the feed emits exact preimages and " +
      "postimages; a txn replay no-ops; overlapping key sets refuse") {
    import spark.implicits._
    val t = freshTable()
    def rows(r: Range, mul: Long) = {
      val df = r.map(k => (k.toLong, k * mul)).toDF("k", "v")
      spark.createDataFrame(df.rdd, org.apache.spark.sql.types.StructType(
        df.schema.map(_.copy(nullable = true))))
    }
    Snapshots.commit(rows(1 to 10, 10), t)   // holds the delete hits
    Snapshots.commit(rows(11 to 20, 10), t)  // holds the update hit
    Snapshots.commit(rows(21 to 30, 10), t)  // untouched — must carry
    def nullable(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(df.rdd, org.apache.spark.sql.types.StructType(
        df.schema.map(_.copy(nullable = true))))
    val delKeys = Seq(1L, 2L, 999L).toDF("k") // 999 matches nothing
    val src = nullable(Seq((11L, 111L), (100L, 1000L)).toDF("k", "v"))
    val got = Snapshots.applyChangesCow(spark, t, delKeys, src, "k",
      txn = Some(("apply-w", 7L)))
    assert(got.contains((4, 2L, 1L, 1L)),
      s"(version, nDeleted, nUpdated, nInserted) was $got")
    // ONE version landed, both legs visible in it
    assert(Snapshots.latestVersion(spark, t) == 4)
    val live = Snapshots.read(spark, t).as[(Long, Long)].collect().toMap
    assert(!live.contains(1L) && !live.contains(2L))
    assert(live(11L) == 111L && live(100L) == 1000L && live(21L) == 210L)
    assert(live.size == 29) // 30 − 2 deleted + 1 fresh insert
    // the untouched directory carries by REFERENCE (same path in both
    // manifests); the two hit directories do not
    val d3 = Snapshots.dataDirsOf(spark, t, 3)
    val d4 = Snapshots.dataDirsOf(spark, t, 4)
    assert(d3.intersect(d4).size == 1,
      s"expected exactly the untouched dir to carry: ${d3.intersect(d4)}")
    // feed of the apply version: deletes = visible preimages of the
    // deleted AND replaced keys, inserts = the source rows, nothing else
    val feed = Snapshots.changeFeed(spark, t, 4, 4)
    val dels = feed.filter(col("_change_type") === "delete")
      .select("k", "v").as[(Long, Long)].collect().toSet
    val ins = feed.filter(col("_change_type") === "insert")
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(dels == Set((1L, 10L), (2L, 20L), (11L, 110L)))
    assert(ins == Set((11L, 111L), (100L, 1000L)))
    // fold law across the apply: read(4) == read(3) − deletes + inserts
    val folded = Snapshots.read(spark, t, Some(3)).as[(Long, Long)]
      .collect().toSet -- dels ++ ins
    assert(folded == Snapshots.read(spark, t, Some(4))
      .as[(Long, Long)].collect().toSet)
    // a REPLAY of the same (writerId, batchId) no-ops before any writes
    assert(Snapshots.applyChangesCow(spark, t, delKeys, src, "k",
      txn = Some(("apply-w", 7L))).isEmpty)
    assert(Snapshots.latestVersion(spark, t) == 4)
    // overlapping delete/upsert keys are ambiguous — refused loudly
    val e = intercept[IllegalArgumentException](Snapshots.applyChangesCow(
      spark, t, Seq(100L).toDF("k"),
      nullable(Seq((100L, 5L)).toDF("k", "v")), "k"))
    assert(e.getMessage.contains("overlap"))
  }

  test("applyChangesCow race: two appliers of the same tagged range " +
      "commit exactly once") {
    import spark.implicits._
    val t = freshTable()
    val base = (1L to 30L).map(k => (k, k)).toDF("k", "v")
    Snapshots.commit(spark.createDataFrame(base.rdd,
      org.apache.spark.sql.types.StructType(
        base.schema.map(_.copy(nullable = true)))), t)
    val delKeys = Seq(1L, 2L).toDF("k")
    val src = spark.createDataFrame(
      Seq((3L, 333L), (100L, 100L)).toDF("k", "v").rdd,
      org.apache.spark.sql.types.StructType(
        Seq((3L, 333L), (100L, 100L)).toDF("k", "v")
          .schema.map(_.copy(nullable = true))))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val results = Await.result(Future.sequence((1 to 2).map(_ => Future {
      Snapshots.applyChangesCow(spark, t, delKeys, src, "k",
        txn = Some(("race-w", 1L)))
    })), 120.seconds)
    assert(results.count(_.isDefined) == 1,
      s"expected exactly one winning apply, got $results")
    assert(Snapshots.latestVersion(spark, t) == 2)
    val live = Snapshots.read(spark, t).as[(Long, Long)].collect().toMap
    assert(live.size == 29 && live(3L) == 333L && live(100L) == 100L &&
      !live.contains(1L))
  }

  test("string manifest stats: point lookups prune dirs on truncated " +
      "bounds; non-ASCII bounds stay advisory; result equals full filter") {
    import spark.implicits._
    val t = freshTable()
    // three dirs with disjoint key prefixes, keys LONGER than the
    // 16-char truncation window
    def slice(p: Char) = (0 until 20).map(i =>
      (f"doc_${p}${p}${p}_${i}%012d_tail", i.toLong)).toDF("doc_id", "v")
    Snapshots.commitWithStringStats(slice('a'), t, "doc_id")
    Snapshots.commitWithStringStats(slice('m'), t, "doc_id")
    Snapshots.commitWithStringStats(slice('z'), t, "doc_id")
    // point lookup for an m-range key opens ONLY the m dir
    val key = f"doc_mmm_${7}%012d_tail"
    val scan = Snapshots.readPrunedString(spark, t, "doc_id", key, key)
    assert(scan.dirsTotal == 3 && scan.dirsRead == 1,
      s"expected 1/3 dirs, got ${scan.dirsRead}/${scan.dirsTotal}")
    assert(scan.df.count() == 1 &&
      scan.df.select("v").as[Long].head() == 7L)
    // range spanning a..m opens two dirs, answer == full-scan filter
    val range = Snapshots.readPrunedString(spark, t, "doc_id", "doc_a", "doc_n")
    assert(range.dirsRead == 2)
    val full = Snapshots.read(spark, t)
      .filter($"doc_id" >= "doc_a" && $"doc_id" <= "doc_n")
    assert(range.df.exceptAll(full).isEmpty && full.exceptAll(range.df).isEmpty)
    // a dir whose bounds are non-ASCII records no stats → always read
    Snapshots.commitWithStringStats(
      Seq(("döc_ü_nonascii", 99L)).toDF("doc_id", "v"), t, "doc_id")
    val after = Snapshots.readPrunedString(spark, t, "doc_id", key, key)
    assert(after.dirsTotal == 4 && after.dirsRead == 2,
      s"non-ASCII dir must stay advisory-read: ${after.dirsRead}/4")
    assert(after.df.count() == 1)
    // truncated-incremented upper bound is still a valid bound: a key
    // sharing the m-dir's 16-char prefix but sorting above every real
    // key must still ADMIT the m dir (conservative, never lossy)
    val probe = f"doc_mmm_${19}%012d_zzzz"
    val hi = Snapshots.readPrunedString(spark, t, "doc_id", probe, probe)
    assert(hi.dirsRead >= 1 && hi.df.count() == 0)
  }

  test("partition evolution: flat and hive-partitioned dirs coexist in " +
      "one read; partition filter prunes the new-spec branch; compaction " +
      "migrates; renaming a live partition column refuses") {
    import spark.implicits._
    val t = freshTable()
    val flat = (1L to 40L).map(k => (k, s"s${k % 4}", k * 10))
      .toDF("k", "seg", "cents")
    Snapshots.commit(flat.filter($"k" <= 20), t)
    // spec CHANGES for new data: hive-partition by seg
    val v2 = Snapshots.commitPartitioned(flat.filter($"k" > 20), t, Seq("seg"))
    assert(v2 == 2)
    // one read spans both layouts, bit-for-bit
    val got = Snapshots.read(spark, t).select("k", "seg", "cents")
    assert(got.exceptAll(flat).isEmpty && flat.exceptAll(got).isEmpty)
    // the partition filter reaches the new-spec scan as a PartitionFilter
    val q = Snapshots.read(spark, t).filter($"seg" === "s1")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("PartitionFilters: [isnotnull(seg"),
      s"partition filter did not reach the hive-spec scan:\n$plan")
    assert(q.count() == flat.filter($"seg" === "s1").count())
    // time travel: v1 reads the flat era only
    assert(Snapshots.read(spark, t, Some(1)).count() == 20)
    // a live partition column refuses to rename (paths encode it)
    val e = intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, t, "seg", "segment"))
    assert(e.getMessage.contains("partition column"))
    // compaction folds BOTH layouts into one flat dir, rows identical —
    // and the spec line for the rewritten dir is gone, unblocking rename
    val (v3, nComp, _) = Snapshots.compactSmall(spark, t, smallBytes = 1L << 30)
    assert(v3 == 3 && nComp == 2)
    val after = Snapshots.read(spark, t).select("k", "seg", "cents")
    assert(after.exceptAll(flat).isEmpty && flat.exceptAll(after).isEmpty)
    assert(Snapshots.renameColumn(spark, t, "seg", "segment") == 4)
    assert(Snapshots.read(spark, t).columns.contains("segment"))
  }

  test("commitPartitioned: numeric-looking STRING partition values " +
      "round-trip verbatim; the null-sentinel and empty string refuse") {
    import spark.implicits._
    val t = freshTable()
    // zero-padded / float-ish / scientific values: path-type inference
    // would read these back as 1 / 1.1 / 1000.0 — the contract cast
    // must see the raw path STRING, not an inferred numeric
    val rows = Seq((1L, "01"), (2L, "1.10"), (3L, "1e3"), (4L, "s1"),
      (5L, "01")).toDF("k", "seg")
    assert(Snapshots.commitPartitioned(rows, t, Seq("seg")) == 1)
    val got = Snapshots.read(spark, t).select("k", "seg")
    assert(got.exceptAll(rows).isEmpty && rows.exceptAll(got).isEmpty,
      s"partition values corrupted: ${got.collect().mkString(", ")}")
    // and a genuine NULL partition value round-trips as NULL
    val withNull = Seq((6L, Option.empty[String])).toDF("k", "seg")
    assert(Snapshots.commitPartitioned(withNull, t, Seq("seg")) == 2)
    assert(Snapshots.read(spark, t).filter($"seg".isNull)
      .select("k").as[Long].collect().toSeq == Seq(6L))
    // a literal sentinel (or empty-string) value would read back NULL —
    // refused before any write
    val e1 = intercept[IllegalArgumentException](Snapshots.commitPartitioned(
      Seq((7L, "__HIVE_DEFAULT_PARTITION__")).toDF("k", "seg"), t, Seq("seg")))
    assert(e1.getMessage.contains("read it back as NULL"))
    val e2 = intercept[IllegalArgumentException](Snapshots.commitPartitioned(
      Seq((8L, "")).toDF("k", "seg"), t, Seq("seg")))
    assert(e2.getMessage.contains("read it back as NULL"))
    // an INT partition column still lands typed under the contract
    val t2 = freshTable()
    val intRows = Seq((1L, 7), (2L, 8)).toDF("k", "bucket")
    Snapshots.commitPartitioned(intRows, t2, Seq("bucket"))
    val schema = Snapshots.read(spark, t2).schema
    assert(schema("bucket").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val got2 = Snapshots.read(spark, t2).select("k", "bucket")
    assert(got2.exceptAll(intRows).isEmpty && intRows.exceptAll(got2).isEmpty)
  }

  test("commit-level user properties: round-trip commit → propsOf → " +
      "tableHistory → changeFeed; per-version, never carried") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), t,
      props = Map("pipeline" -> "ingest v2", "source" -> "crawl/2026-08"))
    Snapshots.commit(Seq((3L, "c")).toDF("k", "s"), t) // no props
    // round-trip with URL-encoded specials (space, slash)
    assert(Snapshots.propsOf(spark, t, 1) ==
      Map("pipeline" -> "ingest v2", "source" -> "crawl/2026-08"))
    assert(Snapshots.propsOf(spark, t, 2).isEmpty) // never carried
    val hist = Snapshots.tableHistory(spark, t)
      .orderBy("version").collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(hist(0).getString(3) ==
      "pipeline=ingest v2;source=crawl/2026-08" && hist(1).getString(3) == "")
    assert(hist.forall(_.getString(1) == "append"))
    // the feed stamps every row with its version's props
    val feed = Snapshots.changeFeed(spark, t, 1, 2)
    val byV = feed.select("_commit_version", "_commit_props").distinct()
      .as[(Int, String)].collect().toMap
    assert(byV(1) == "pipeline=ingest v2;source=crawl/2026-08" &&
      byV(2) == "")
    // exactly-once writers record lineage too
    Snapshots.commitIfAbsent(Seq((4L, "d")).toDF("k", "s"), t, "w1", 0L,
      props = Map("batch" -> "0"))
    assert(Snapshots.propsOf(spark, t, 3) == Map("batch" -> "0"))
  }

  test("optimizeClustered refuses a NULL z-column value BEFORE any " +
      "rewrite — no staging dirs, version unchanged") {
    import spark.implicits._
    val rows = Seq((1L, Some(3L), "a"), (2L, None, "b"), (3L, Some(5L), "c"))
    val t = freshTable()
    Snapshots.commit(rows.toDF("id", "z", "s"), t)
    val e = intercept[IllegalArgumentException] {
      Snapshots.optimizeClustered(spark, t, Seq("id", "z"),
        bitsPerDim = 8, nChunks = 4)
    }
    assert(e.getMessage.contains("NULL") && e.getMessage.contains("z"))
    assert(Snapshots.latestVersion(spark, t) == 1)
    // fail-fast means no .opt-* staging dir was ever written
    val f = new java.io.File(t)
    assert(!f.listFiles().exists(_.getName.startsWith(".opt-")))
  }

  /** LWW fold of the full feed — the reconstruction the fold-law tests
    * assert; insert outranks delete within a version.
    */
  private def foldedView(t: String, cols: String*)
      : org.apache.spark.sql.DataFrame = {
    val latest = Snapshots.latestVersion(spark, t)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(cols.head)
      .orderBy(desc("_commit_version"),
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    Snapshots.changeFeed(spark, t, 1, latest)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("_change_type") === "insert")
      .select(cols.map(col): _*)
  }

  test("restoreTo: zero-copy rollback; CoW-delete survivors stay live " +
      "through the same-version delete+insert pair; feed fold law holds") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    Snapshots.commit((11L to 14L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    // v3: CoW delete rewrites the hit dirs — survivors MOVE directories
    Snapshots.deleteWhere(spark, t, col("k") % 3 === 0)
    assert(Snapshots.read(spark, t).count() == 10)
    // v4: restore to v2 — deleted keys come back, pure metadata
    assert(Snapshots.restoreTo(spark, t, 2).contains(4))
    assert(Snapshots.dataDirsOf(spark, t, 4).toSet ==
      Snapshots.dataDirsOf(spark, t, 2).toSet,
      "restore must re-reference the target's directories verbatim")
    val head = Snapshots.read(spark, t).select("k", "v")
    val atV2 = Snapshots.read(spark, t, Some(2)).select("k", "v")
    assert(head.exceptAll(atV2).isEmpty && atV2.exceptAll(head).isEmpty)
    // the restore version's feed: survivors emit delete(moved copy) +
    // insert(original) — identical values, insert wins; deleted keys
    // emit insert only
    val v4 = Snapshots.changeFeed(spark, t, 4, 4)
    assert(v4.filter(col("_change_type") === "insert").count() == 14)
    assert(v4.filter(col("_change_type") === "delete").count() == 10)
    val folded = foldedView(t, "k", "v")
    assert(folded.exceptAll(head).isEmpty && head.exceptAll(folded).isEmpty,
      "fold law must hold through the restore")
    // roll FORWARD: restoring to v3 undoes the restore
    assert(Snapshots.restoreTo(spark, t, 3).contains(5))
    val again = Snapshots.read(spark, t).select("k", "v")
    val atV3 = Snapshots.read(spark, t, Some(3)).select("k", "v")
    assert(again.exceptAll(atV3).isEmpty && atV3.exceptAll(again).isEmpty)
    val folded2 = foldedView(t, "k", "v")
    assert(folded2.exceptAll(again).isEmpty &&
      again.exceptAll(folded2).isEmpty)
  }

  test("restoreTo: a removed PARTITIONED directory's spec line carries " +
      "so the feed's preimage read resolves the partition column") {
    import spark.implicits._
    val t = freshTable()
    def nullable(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(df.rdd, org.apache.spark.sql.types.StructType(
        df.schema.map(_.copy(nullable = true))))
    Snapshots.commit(nullable((1L to 6L).map(k => (k, s"p${k % 2}", k * 10L))
      .toDF("k", "g", "v")), t)
    Snapshots.commitPartitioned(
      nullable((7L to 12L).map(k => (k, s"p${k % 2}", k * 10L))
        .toDF("k", "g", "v")), t, Seq("g"))
    assert(Snapshots.restoreTo(spark, t, 1).contains(3))
    // the rollback's delete preimages are the partitioned dir's rows —
    // the partition column must come back with real values, not NULLs
    val dels = Snapshots.changeFeed(spark, t, 3, 3)
      .filter(col("_change_type") === "delete").select("k", "g", "v")
    assert(dels.count() == 6 && dels.filter(col("g").isNull).count() == 0)
    val expect = (7L to 12L).map(k => (k, s"p${k % 2}", k * 10L))
      .toDF("k", "g", "v")
    assert(dels.exceptAll(expect).isEmpty && expect.exceptAll(dels).isEmpty)
  }

  test("restoreTo refusals: live dvs either end, schema drift, rename " +
      "drift, non-past target; txn tag makes a replay no-op") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    Snapshots.commit((11L to 14L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    // head carries live dvs → refuse
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 5 === 0)
    val e1 = intercept[IllegalArgumentException](
      Snapshots.restoreTo(spark, t, 1))
    assert(e1.getMessage.contains("deletion vectors"))
    // v4 materializes; v3 (the dv commit) is an ILLEGAL target
    Snapshots.materializeDeletes(spark, t)
    val e2 = intercept[IllegalArgumentException](
      Snapshots.restoreTo(spark, t, 3))
    assert(e2.getMessage.contains("deletion vectors"))
    // a non-past target refuses
    val e3 = intercept[IllegalArgumentException](
      Snapshots.restoreTo(spark, t, Snapshots.latestVersion(spark, t)))
    assert(e3.getMessage.contains("must precede"))
    // tagged restore lands once; the replay no-ops on the txn tag
    assert(Snapshots.restoreTo(spark, t, 1,
      txn = Some(("orch", 7L))).contains(5))
    assert(Snapshots.restoreTo(spark, t, 1, txn = Some(("orch", 7L))).isEmpty)
    // additive evolution after the restore → pre-evolution targets refuse
    Snapshots.commit((20L to 22L).map(k => (k, k * 10L, s"t$k"))
      .toDF("k", "v", "tag"), t, allowEvolve = true)
    val e4 = intercept[IllegalArgumentException](
      Snapshots.restoreTo(spark, t, 1))
    assert(e4.getMessage.contains("schema differs"))
    // rename drift refuses too (rename back first)
    val t2 = freshTable()
    Snapshots.commit((1L to 3L).map(k => (k, k * 10L)).toDF("k", "v"), t2)
    Snapshots.commit((4L to 5L).map(k => (k, k * 10L)).toDF("k", "v"), t2)
    Snapshots.renameColumn(spark, t2, "v", "w")
    val e5 = intercept[IllegalArgumentException](
      Snapshots.restoreTo(spark, t2, 1))
    assert(e5.getMessage.contains("rename mapping differs"))
    // a vacuumed target raises the TYPED out-of-retention error
    val t3 = freshTable()
    Snapshots.commit(Seq((1L, 1L)).toDF("k", "v"), t3)
    Snapshots.commit(Seq((2L, 2L)).toDF("k", "v"), t3)
    Snapshots.commit(Seq((3L, 3L)).toDF("k", "v"), t3)
    Snapshots.vacuum(spark, t3, keepVersions = 1, orphanGraceMs = 0L)
    intercept[Snapshots.OutOfRetentionException](
      Snapshots.restoreTo(spark, t3, 1))
  }

  test("restoreTo races a concurrent append: the CAS serializes them — " +
      "whichever lands second is the table's truth, and the fold law " +
      "holds either way") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    Snapshots.commit((11L to 14L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val restore = Future { Snapshots.restoreTo(spark, t, 1) }
    val append = Future {
      Snapshots.commit((100L to 104L).map(k => (k, k)).toDF("k", "v"), t)
    }
    val rv = Await.result(restore, 300.seconds).get
    val av = Await.result(append, 300.seconds)
    assert(Set(rv, av) == Set(3, 4), s"CAS must serialize ($rv, $av)")
    val n = Snapshots.read(spark, t).count()
    // append-then-restore: the restore recomputed against the appended
    // head and ROLLED THE APPEND BACK TOO (write-serializable: restore
    // means "back to v1", whatever landed meanwhile). restore-then-
    // append: the appended rows sit on the restored base.
    assert(if (rv > av) n == 10 else n == 15,
      s"unexpected row count $n for order (restore=$rv, append=$av)")
    val latest = Snapshots.latestVersion(spark, t)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(desc("_commit_version"),
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val folded = Snapshots.changeFeed(spark, t, 1, latest)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("_change_type") === "insert")
      .select("k", "v")
    val live = Snapshots.read(spark, t).select("k", "v")
    assert(folded.exceptAll(live).isEmpty && live.exceptAll(folded).isEmpty,
      "fold law must hold under the race, either serialization")
  }

  test("cloneShallow: zero-copy create; reads, time travel, pruning, " +
      "and the clone's own feed work; divergence is isolated BOTH ways") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    Snapshots.commitWithStats(
      (1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), src, "k")
    Snapshots.commitWithStats(
      (11L to 20L).map(k => (k, k * 10L)).toDF("k", "v"), src, "k")
    assert(Snapshots.cloneShallow(spark, src, dst) == 1)
    // ZERO COPY: the clone wrote a manifest, not a byte of data
    assert(!new java.io.File(s"$dst/data").exists(),
      "a shallow clone must not materialize any data directory")
    val srcDf = Snapshots.read(spark, src).select("k", "v")
    val dstDf = Snapshots.read(spark, dst).select("k", "v")
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty)
    // stats lines re-keyed to the absolutized tokens: pruning works
    val pruned = Snapshots.readPruned(spark, dst, "k", 15L, 18L)
    assert(pruned.dirsTotal == 2 && pruned.dirsRead == 1,
      s"clone pruning lost the stats (${pruned.dirsTotal}/${pruned.dirsRead})")
    assert(pruned.df.count() == 4)
    // the clone's feed: version 1 IS its full content as inserts
    val feed = Snapshots.changeFeed(spark, dst, 1, 1)
    assert(feed.filter(col("_change_type") === "insert").count() == 20)
    // clone diverges: append + MoR delete land in the CLONE's chain only
    Snapshots.commit((21L to 25L).map(k => (k, k * 10L)).toDF("k", "v"), dst)
    Snapshots.deleteWhereMoR(spark, dst, "k", col("k") <= 2)
    assert(Snapshots.read(spark, dst).count() == 23)
    assert(Snapshots.latestVersion(spark, src) == 2 &&
      Snapshots.read(spark, src).count() == 20,
      "clone writes must never touch the source")
    // source diverges: the clone is pinned to its cloned version
    Snapshots.commit(Seq((99L, 990L)).toDF("k", "v"), src)
    assert(Snapshots.read(spark, dst).count() == 23,
      "source writes must never reach the clone")
    // vacuum on the CLONE never GCs external paths
    Snapshots.vacuum(spark, dst, keepVersions = 1, orphanGraceMs = 0L)
    assert(Snapshots.read(spark, dst).count() == 23 &&
      Snapshots.read(spark, src).count() == 21)
  }

  test("cloneShallow: CoW rewrites refuse on externals; deepenClone " +
      "folds them local; clone-of-clone chains; refusals") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    val dst2 = freshTable()
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), src)
    Snapshots.commit((11L to 14L).map(k => (k, k * 10L)).toDF("k", "v"), src)
    Snapshots.cloneShallow(spark, src, dst)
    // every CoW rewrite refuses while externals remain
    val e1 = intercept[IllegalArgumentException](
      Snapshots.deleteWhere(spark, dst, col("k") % 2 === 0))
    assert(e1.getMessage.contains("external"))
    val e2 = intercept[IllegalArgumentException](
      Snapshots.mergeUpsert(spark, dst,
        Seq((1L, 111L)).toDF("k", "v"), "k"))
    assert(e2.getMessage.contains("external"))
    // clone-of-clone: still zero-copy, externals stay absolute
    Snapshots.cloneShallow(spark, dst, dst2)
    assert(!new java.io.File(s"$dst2/data").exists())
    assert(Snapshots.read(spark, dst2).count() == 14)
    // deepen: one local rewrite, rows identical, feed silent
    val (v2, folded) = Snapshots.deepenClone(spark, dst)
    assert(v2 == 2 && folded == 2)
    assert(Snapshots.read(spark, dst).select("k", "v")
      .exceptAll((1L to 14L).map(k => (k, k * 10L)).toDF("k", "v")).isEmpty)
    assert(Snapshots.changeFeed(spark, dst, 2, 2).count() == 0,
      "deepening moves bytes, never rows — the feed must stay silent")
    // deepened clone: CoW ops now work, and a SOURCE vacuum can no
    // longer break it (the Delta shallow-clone caveat, safe direction)
    assert(Snapshots.deleteWhere(spark, dst, col("k") % 7 === 0)._1 == 3)
    Snapshots.commit(Seq((99L, 990L)).toDF("k", "v"), src)
    Snapshots.vacuum(spark, src, keepVersions = 1, orphanGraceMs = 0L)
    assert(Snapshots.read(spark, dst).count() == 12)
    // a second deepen is a no-op
    assert(Snapshots.deepenClone(spark, dst) == (3, 0))
    // refusals: non-empty target, dv-carrying source, vacuumed version
    val e3 = intercept[IllegalArgumentException](
      Snapshots.cloneShallow(spark, src, dst))
    assert(e3.getMessage.contains("already has commits"))
    Snapshots.deleteWhereMoR(spark, src, "k", col("k") === 99L)
    val e4 = intercept[IllegalArgumentException](
      Snapshots.cloneShallow(spark, src, freshTable()))
    assert(e4.getMessage.contains("deletion vectors"))
    intercept[Snapshots.OutOfRetentionException](
      Snapshots.cloneShallow(spark, src, freshTable(), version = Some(1)))
  }

  test("dirbloom lifecycle: point lookups skip non-member dirs; a " +
      "rewrite drops its dir's sketch (lossy-never); clones re-key " +
      "both tokens; vacuum pins referenced sidecars") {
    import spark.implicits._
    val t = freshTable()
    // two disjoint key sets, scattered enough that ranges overlap
    Snapshots.commitWithBloom(
      Seq(1L, 901L, 13L, 777L).map(k => (k, k * 10L)).toDF("k", "v"),
      t, "k")
    Snapshots.commitWithBloom(
      Seq(2L, 900L, 14L, 778L).map(k => (k, k * 10L)).toDF("k", "v"),
      t, "k")
    val s1 = Snapshots.readPrunedBloom(spark, t, "k", 901L)
    assert(s1.dirsTotal == 2 && s1.dirsRead == 1 && s1.df.count() == 1)
    assert(s1.df.head().getLong(1) == 9010L)
    // absent key: nothing, regardless of what the sketches admit
    assert(Snapshots.readPrunedBloom(spark, t, "k", 555L).df.count() == 0)
    // a CoW delete rewrites dir 1 — its sketch line must DROP with it
    // (the survivor dir has no sketch → always reads; never lossy)
    Snapshots.deleteWhere(spark, t, col("k") === 13L)
    val s2 = Snapshots.readPrunedBloom(spark, t, "k", 901L)
    assert(s2.df.count() == 1 && s2.df.head().getLong(1) == 9010L)
    // the sketchless survivor always reads; the carried dir's sketch
    // rejects 901 — exactly one dir opened
    assert(s2.dirsTotal == 2 && s2.dirsRead == 1)
    // clone: both #dirbloom tokens re-key into the source's path — the
    // re-keyed sketch is consulted (a broken path would throw) and
    // still prunes the non-member dir
    val dst = freshTable()
    Snapshots.cloneShallow(spark, t, dst)
    val s3 = Snapshots.readPrunedBloom(spark, dst, "k", 901L)
    assert(s3.dirsTotal == 2 && s3.dirsRead == 1)
    assert(s3.df.count() == 1 && s3.df.head().getLong(1) == 9010L)
    // vacuum keeps sidecars referenced by the retained manifest
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    val s4 = Snapshots.readPrunedBloom(spark, t, "k", 900L)
    assert(s4.df.count() == 1 && s4.df.head().getLong(1) == 9000L)
  }

  test("dirbloom over a STRING key: doc-id point lookups skip " +
      "non-member dirs, membership matches the inserted UTF-8 bytes") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commitWithBloom(
      Seq("doc_a1", "doc_z9", "doc_m4").map(d => (d, d.length.toLong))
        .toDF("doc_id", "n"), t, "doc_id")
    Snapshots.commitWithBloom(
      Seq("doc_b2", "doc_y8", "doc_k3").map(d => (d, d.length.toLong))
        .toDF("doc_id", "n"), t, "doc_id")
    val s1 = Snapshots.readPrunedBloomString(spark, t, "doc_id", "doc_z9")
    assert(s1.dirsTotal == 2 && s1.dirsRead == 1 && s1.df.count() == 1)
    val s2 = Snapshots.readPrunedBloomString(spark, t, "doc_id", "doc_k3")
    assert(s2.dirsRead == 1 && s2.df.count() == 1)
    assert(Snapshots.readPrunedBloomString(spark, t, "doc_id", "doc_q0")
      .df.count() == 0)
  }

  test("maintenancePlan: deepenClone leads the plan on a shallow clone, " +
      "thresholds are strict inequalities, steady state plans empty") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), src)
    Snapshots.commit((11L to 20L).map(k => (k, k * 10L)).toDF("k", "v"), src)
    Snapshots.cloneShallow(spark, src, dst)
    // a MoR delete on the still-shallow clone: the plan must order
    // deepen FIRST (materialize refuses on externals)
    Snapshots.deleteWhereMoR(spark, dst, "k", col("k") <= 3)
    val plan = Snapshots.maintenancePlan(spark, dst,
      smallBytes = 1L << 40, maxDvKeys = 0L, maxVersions = 10)
    // externals stay OUT of the small-dir count (deepen already folds
    // them — double-planning would compact what deepen just wrote)
    assert(plan.map(_.action) == Seq("deepenClone", "materializeDeletes"))
    assert(plan.head.metric == 2 && plan(1).metric == 3)
    // apply in the recommended order — each step unblocks the next
    Snapshots.deepenClone(spark, dst)
    Snapshots.materializeDeletes(spark, dst)
    Snapshots.compactSmall(spark, dst, smallBytes = 1L << 40)
    assert(Snapshots.read(spark, dst).count() == 17)
    // thresholds are STRICT: metric == threshold does not trigger
    val p2 = Snapshots.maintenancePlan(spark, dst,
      smallBytes = 1L << 40, maxDvKeys = 0L, maxVersions = 4)
    assert(p2.isEmpty, s"got ${p2.map(_.action)}")
    // one version fewer in the budget → vacuum recommended
    val p3 = Snapshots.maintenancePlan(spark, dst,
      smallBytes = 1L << 40, maxDvKeys = 0L, maxVersions = 3)
    assert(p3.map(_.action) == Seq("vacuum") && p3.head.metric == 4)
  }

  test("cloneShallow: a relative or URI-addressed source refuses loudly " +
      "(external tokens are classified by their leading '/')") {
    import spark.implicits._
    val src = freshTable()
    Snapshots.commit(Seq((1L, 10L)).toDF("k", "v"), src)
    val rel = intercept[IllegalArgumentException](
      Snapshots.cloneShallow(spark, src.stripPrefix("/"), freshTable()))
    assert(rel.getMessage.contains("absolute"))
    val uri = intercept[IllegalArgumentException](
      Snapshots.cloneShallow(spark, s"file:$src", freshTable()))
    assert(uri.getMessage.contains("scheme"))
    // the plain absolute path still clones
    assert(Snapshots.cloneShallow(spark, src, freshTable()) == 1)
  }

  test("commitWithBloom/WithStats: an EMPTY frame commits (the empty-" +
      "commit contract holds for every stats flavor); the empty dir's " +
      "sketch admits nothing and later lookups stay exact") {
    import spark.implicits._
    val t = freshTable()
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Snapshots.commitWithBloom(empty, t, "k") == 1)
    assert(Snapshots.commitWithStats(empty, t, "k") == 2)
    assert(Snapshots.read(spark, t).count() == 0)
    Snapshots.commitWithBloom(Seq((7L, 70L), (9L, 90L)).toDF("k", "v"),
      t, "k")
    val scan = Snapshots.readPrunedBloom(spark, t, "k", 7L)
    // the two empty dirs' sketches admit nothing → only the data dir
    // (empty-WithStats has no sketch for the bloom probe — it always
    // reads, costing nothing: zero files)
    assert(scan.dirsTotal == 3 && scan.dirsRead <= 2 &&
      scan.df.count() == 1 && scan.df.head().getLong(1) == 70L)
  }

  test("maintenancePlan: a tag pinned below the retention cutoff stays " +
      "out of the vacuum metric — apply-converge reaches the empty plan") {
    import spark.implicits._
    val t = freshTable()
    (1L to 5L).foreach { i =>
      Snapshots.commit(Seq((i, i * 10L)).toDF("k", "v"), t): Unit
    }
    Snapshots.tagVersion(spark, t, "eval-v1", 1)
    val p1 = Snapshots.maintenancePlan(spark, t,
      smallBytes = 1L, maxDvKeys = 0L, maxVersions = 2)
    // v1 is pinned and below the cutoff → excluded from the metric
    // even before the vacuum (4 = v2..v5, of which v2,v3 reclaimable)
    assert(p1.map(_.action) == Seq("vacuum") && p1.head.metric == 4)
    Snapshots.vacuum(spark, t, keepVersions = 2, orphanGraceMs = 0L)
    // v1 survives the vacuum (pinned) — the re-plan must NOT count it,
    // or the fixpoint never terminates
    assert(new java.io.File(s"$t/manifest-v1.txt").exists(),
      "the pinned manifest must survive the vacuum")
    val p2 = Snapshots.maintenancePlan(spark, t,
      smallBytes = 1L, maxDvKeys = 0L, maxVersions = 2)
    assert(p2.isEmpty,
      s"pinned-tag fixpoint broke: ${p2.map(_.action)}")
    // and the pinned version still time-travels
    assert(Snapshots.read(spark, t, Some(1)).count() == 1)
  }

  test("maintenancePlan: the dv metric is the DISTINCT key count over " +
      "the dv-file union — what the read-side anti-join actually probes") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    // two MoR deletes → two dv files in the union: {4,8} then {2,6,10}
    // (the second matches against the dv-applied live view, so the
    // public API keeps dv files disjoint — but the metric must measure
    // the DISTINCT union regardless, matching applyDv's probe set even
    // for dv lines that arrive through replication or crash-replay)
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 4 === 0)
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") % 2 === 0)
    val plan = Snapshots.maintenancePlan(spark, t,
      smallBytes = 1L, maxDvKeys = 0L, maxVersions = 10)
    val dv = plan.find(_.action == "materializeDeletes").get
    assert(dv.metric == 5,
      s"dv metric must be the distinct key count (got ${dv.metric})")
  }

  test("CHECK constraints: addCheck validates existing data; violating " +
      "appends refuse pre-claim naming the constraint; NULL passes " +
      "(ANSI unknown); dropCheck unbinds") {
    import spark.implicits._
    val t = freshTable()
    // v is nullable from the start — the NULL-passes leg below must
    // hit the CHECK semantics, not the schema drift guard
    Snapshots.commit(Seq((1L, Option(10L)), (2L, Option(20L)))
      .toDF("k", "v"), t)
    // a constraint the table already violates refuses at add time
    val bad = intercept[IllegalArgumentException](
      Snapshots.addCheck(spark, t, "v-big", "v >= 15"))
    assert(bad.getMessage.contains("v-big") &&
      bad.getMessage.contains("violated"))
    // a non-boolean expression refuses at add time
    assert(intercept[IllegalArgumentException](
      Snapshots.addCheck(spark, t, "not-bool", "v + 1"))
      .getMessage.contains("boolean"))
    val v2 = Snapshots.addCheck(spark, t, "v-pos", "v > 0")
    assert(v2 == 2 && Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    // the constraint commit is metadata-only and feed-silent
    assert(Snapshots.changeFeed(spark, t, 2, 2).count() == 0)
    // a violating append refuses PRE-CLAIM: version unchanged, and the
    // validation runs over the WRITTEN bytes — the refused write's
    // orphan dir is removed, so the table holds only referenced dirs
    val dirsBefore = Option(new java.io.File(s"$t/data").listFiles())
      .map(_.length).getOrElse(0)
    val e = intercept[IllegalArgumentException](
      Snapshots.commit(Seq((3L, Option(-5L))).toDF("k", "v"), t))
    assert(e.getMessage.contains("v-pos") && e.getMessage.contains("v > 0"))
    assert(Snapshots.latestVersion(spark, t) == 2)
    assert(Option(new java.io.File(s"$t/data").listFiles())
      .map(_.length).getOrElse(0) == dirsBefore,
      "a refused commit must not leave its orphan data dir behind")
    // NULL is unknown, not a violation (ANSI CHECK semantics)
    Snapshots.commit(Seq((3L, Some(30L)), (4L, None))
      .toDF("k", "v"), t, allowEvolve = false)
    assert(Snapshots.read(spark, t).count() == 4)
    // the line CARRIES through ordinary commits
    assert(Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    // dropCheck unbinds: the same violating row now lands
    Snapshots.dropCheck(spark, t, "v-pos")
    assert(Snapshots.checksOf(spark, t).isEmpty)
    Snapshots.commit(Seq((5L, Option(-5L))).toDF("k", "v"), t)
    assert(Snapshots.read(spark, t).filter(col("v") < 0).count() == 1)
    assert(intercept[IllegalArgumentException](
      Snapshots.dropCheck(spark, t, "v-pos"))
      .getMessage.contains("no constraint"))
  }

  test("CHECK constraints bind mergeUpsert and applyChangesCow sources " +
      "pre-claim; maintenance rewrites and WAP publish carry/enforce") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 6L).map(k => (k, k * 10L)).toDF("k", "v"), t)
    Snapshots.addCheck(spark, t, "v-pos", "v > 0")
    // merge with a violating source refuses before any claim
    val vBefore = Snapshots.latestVersion(spark, t)
    assert(intercept[IllegalArgumentException](
      Snapshots.mergeUpsert(spark, t, Seq((2L, -1L)).toDF("k", "v"), "k"))
      .getMessage.contains("v-pos"))
    assert(intercept[IllegalArgumentException](
      Snapshots.applyChangesCow(spark, t, Seq(1L).toDF("k"),
        Seq((2L, -1L)).toDF("k", "v"), "k"))
      .getMessage.contains("v-pos"))
    assert(Snapshots.latestVersion(spark, t) == vBefore)
    // a clean merge lands and the line carries
    Snapshots.mergeUpsert(spark, t, Seq((2L, 222L)).toDF("k", "v"), "k")
    assert(Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    // WAP: the audit can STAGE what publish refuses
    val stage = Snapshots.commitStaged(
      Seq((9L, -9L)).toDF("k", "v"), t)
    assert(Snapshots.readStaged(spark, t, stage)
      .filter(col("v") < 0).count() == 1,
      "the audit must see the staged violation")
    assert(intercept[IllegalArgumentException](
      Snapshots.publishStaged(spark, t, stage))
      .getMessage.contains("v-pos"))
    Snapshots.abandonStaged(spark, t, stage)
    // a compliant stage publishes, constraint carried
    val ok = Snapshots.commitStaged(Seq((9L, 90L)).toDF("k", "v"), t)
    Snapshots.publishStaged(spark, t, ok)
    assert(Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    // maintenance rewrites carry the line (moving validated rows)
    Snapshots.deleteWhereMoR(spark, t, "k", col("k") === 1L)
    Snapshots.materializeDeletes(spark, t)
    Snapshots.compactSmall(spark, t, smallBytes = 1L << 40)
    assert(Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    assert(intercept[IllegalArgumentException](
      Snapshots.commit(Seq((10L, -1L)).toDF("k", "v"), t))
      .getMessage.contains("v-pos"))
  }

  test("CHECK constraints: rename refusal when referenced, carry when " +
      "not; restore requires equal sets; evolve interplay; clones " +
      "inherit") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), t)
    Snapshots.addCheck(spark, t, "v-pos", "v > 0")
    // rename of the referenced column refuses with the actionable path
    val e = intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, t, "v", "w"))
    assert(e.getMessage.contains("v-pos") && e.getMessage.contains("dropCheck"))
    // an UNRELATED rename carries the constraint and it keeps binding
    Snapshots.renameColumn(spark, t, "k", "key")
    assert(Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    assert(intercept[IllegalArgumentException](
      Snapshots.commit(Seq((3L, -1L)).toDF("key", "v"), t))
      .getMessage.contains("v-pos"))
    // ADDITIVE evolution alongside a live constraint: the widened
    // frame still validates against the (old-column) expression
    Snapshots.commit(Seq((3L, 30L, "x")).toDF("key", "v", "tag"), t,
      allowEvolve = true)
    assert(Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    // restore across a CHANGED check set refuses; after re-aligning,
    // the restore lands and carries the set
    val headV = Snapshots.latestVersion(spark, t)
    Snapshots.dropCheck(spark, t, "v-pos")
    assert(intercept[IllegalArgumentException](
      Snapshots.restoreTo(spark, t, headV))
      .getMessage.contains("CHECK"))
    Snapshots.addCheck(spark, t, "v-pos", "v > 0")
    // target headV carried the same single constraint → sets equal
    assert(Snapshots.restoreTo(spark, t, headV).isDefined)
    assert(Snapshots.checksOf(spark, t) == Map("v-pos" -> "v > 0"))
    // clones inherit the contract
    val dst = freshTable()
    Snapshots.cloneShallow(spark, t, dst)
    assert(Snapshots.checksOf(spark, dst) == Map("v-pos" -> "v > 0"))
    assert(intercept[IllegalArgumentException](
      Snapshots.commit(Seq((9L, -1L, "y")).toDF("key", "v", "tag"), dst))
      .getMessage.contains("v-pos"))
  }

  test("#dirrows lines: every commit records its dir's exact footer " +
      "count; carries through rename, WAP publish, and restore; an " +
      "empty commit records zero") {
    import spark.implicits._
    val t = freshTable()
    def rowsLines() = {
      val latest = Snapshots.latestVersion(spark, t)
      scala.io.Source.fromFile(s"$t/manifest-v$latest.txt").getLines()
        .filter(_.startsWith("#dirrows ")).map(_.split(" "))
        .map(p => p(1) -> p(2).toLong).toMap
    }
    Snapshots.commit((1L to 30L).map(k => (k, k)).toDF("k", "v"), t)
    Snapshots.commit((31L to 50L).map(k => (k, k)).toDF("k", "v"), t)
    assert(rowsLines().values.toSeq.sorted == Seq(20L, 30L))
    // rename carries the lines verbatim (no column token to re-key)
    Snapshots.renameColumn(spark, t, "v", "w")
    assert(rowsLines().values.toSeq.sorted == Seq(20L, 30L))
    // WAP: the staged dir's count lands at publish
    val stage = Snapshots.commitStaged(
      (51L to 55L).map(k => (k, k)).toDF("k", "w"), t)
    Snapshots.publishStaged(spark, t, stage)
    assert(rowsLines().values.toSeq.sorted == Seq(5L, 20L, 30L))
    // restore back to v3 (post-rename): exactly the target's lines
    Snapshots.restoreTo(spark, t, 3)
    assert(rowsLines().values.toSeq.sorted == Seq(20L, 30L))
    // an empty commit records an explicit zero
    Snapshots.commit(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT NOT NULL, w BIGINT NOT NULL")), t)
    assert(rowsLines().values.toSeq.sorted == Seq(0L, 20L, 30L))
  }

  test("readForScan honors an EMPTY IN-list: zero rows (IN () matches " +
      "nothing), not the whole unfiltered table") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 20L).map(k => (k, s"s$k")).toDF("k", "tag"), t)
    assert(Snapshots.readForScan(spark, t,
      preds = Seq(Snapshots.InLongPred("k", Nil))).df.count() == 0,
      "empty long IN-list must match zero rows")
    assert(Snapshots.readForScan(spark, t,
      preds = Seq(Snapshots.InStringPred("tag", Nil))).df.count() == 0,
      "empty string IN-list must match zero rows")
    // non-empty lists still answer exactly
    assert(Snapshots.readForScan(spark, t,
      preds = Seq(Snapshots.InLongPred("k", Seq(3L, 7L)))).df.count() == 2)
  }

  test("bloom sidecar memoization: N repeated lookups deserialize each " +
      "sidecar ONCE (immutable files cache by path)") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commitWithBloom(
      Seq(1L, 901L, 13L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    Snapshots.commitWithBloom(
      Seq(2L, 900L, 14L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    // first lookup warms the cache (≤ 2 opens — one per sidecar)
    assert(Snapshots.readPrunedBloom(spark, t, "k", 901L).df.count() == 1)
    val warm = Snapshots.bloomSidecarOpens.get()
    (1 to 10).foreach { _ =>
      assert(Snapshots.readPrunedBloom(spark, t, "k", 900L).dirsRead == 1)
      assert(Snapshots.readForScan(spark, t,
        preds = Seq(Snapshots.EqLongPred("k", 901L))).dirsRead == 1)
    }
    assert(Snapshots.bloomSidecarOpens.get() == warm,
      "repeated lookups must not re-open cached sidecars")
  }

  test("renameColumn carries #dirbloom sidecars: sketches on an " +
      "untouched column keep pruning, and renaming the sketched column " +
      "itself re-keys its lines (values, not names, are hashed)") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commitWithBloom(
      Seq(1L, 901L, 13L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    Snapshots.commitWithBloom(
      Seq(2L, 900L, 14L).map(k => (k, k * 10L)).toDF("k", "v"), t, "k")
    // rename the NON-sketched column: sketches must survive untouched
    Snapshots.renameColumn(spark, t, "v", "w")
    val s1 = Snapshots.readPrunedBloom(spark, t, "k", 901L)
    assert(s1.dirsTotal == 2 && s1.dirsRead == 1 && s1.df.count() == 1,
      s"sketches must survive an unrelated rename (${s1.dirsRead}/2)")
    // rename the SKETCHED column: lines re-key, membership still exact
    Snapshots.renameColumn(spark, t, "k", "key")
    val s2 = Snapshots.readPrunedBloom(spark, t, "key", 900L)
    assert(s2.dirsTotal == 2 && s2.dirsRead == 1 && s2.df.count() == 1,
      s"sketches must re-key with their column (${s2.dirsRead}/2)")
    assert(Snapshots.readPrunedBloom(spark, t, "key", 555L).df.count() == 0)
  }

  test("latestVersion: a fresh hint answers with O(1) existence probes " +
      "(no manifest listing); stale and missing hints recover") {
    val t = freshTable()
    val f = new java.io.File(t)
    f.mkdirs()
    // fabricate a 200-version chain directly — this leg tests ONLY the
    // listing behavior, no data needs to exist
    (1 to 200).foreach { v =>
      val w = new java.io.FileWriter(s"$t/manifest-v$v.txt")
      try w.write("#schema k BIGINT\n") finally w.close()
    }
    def withCounts[A](body: => A): (A, Long, Long) = {
      val p0 = Snapshots.manifestProbeCount.get()
      val l0 = Snapshots.manifestListFallbacks.get()
      val r = body
      (r, Snapshots.manifestProbeCount.get() - p0,
        Snapshots.manifestListFallbacks.get() - l0)
    }
    // fresh hint: exactly 2 probes (hit at 200, miss at 201), no listing
    new java.io.FileWriter(s"$t/_latest") { write("200"); close() }
    val (v1, probes1, lists1) = withCounts(
      Snapshots.latestVersion(spark, t))
    assert(v1 == 200 && probes1 == 2 && lists1 == 0,
      s"fresh hint must be O(1): $probes1 probes, $lists1 listings")
    // stale hint: probes forward the gap, still no listing
    new java.io.FileWriter(s"$t/_latest") { write("190"); close() }
    val (v2, probes2, lists2) = withCounts(
      Snapshots.latestVersion(spark, t))
    assert(v2 == 200 && probes2 == 12 && lists2 == 0,
      s"stale hint must probe the gap: $probes2 probes, $lists2 listings")
    // missing hint: the listing is the authority
    new java.io.File(s"$t/_latest").delete()
    val (v3, _, lists3) = withCounts(Snapshots.latestVersion(spark, t))
    assert(v3 == 200 && lists3 == 1, "missing hint must fall back")
    // hint below a vacuumed cutoff: manifest gone → listing recovers
    (1 to 150).foreach(v => new java.io.File(s"$t/manifest-v$v.txt").delete())
    new java.io.FileWriter(s"$t/_latest") { write("100"); close() }
    val (v4, _, lists4) = withCounts(Snapshots.latestVersion(spark, t))
    assert(v4 == 200 && lists4 == 1, "vacuumed-hint must fall back")
  }

  test("versionAt: resolves the version live at an instant, loud below " +
      "retention and before the first commit") {
    import spark.implicits._
    val t = freshTable()
    val before = System.currentTimeMillis() - 5
    Snapshots.commit(Seq((1L, 1L)).toDF("k", "v"), t)
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    Snapshots.commit(Seq((2L, 2L)).toDF("k", "v"), t)
    assert(Snapshots.versionAt(spark, t, mid) == 1)
    assert(Snapshots.versionAt(spark, t, System.currentTimeMillis()) == 2)
    intercept[IllegalArgumentException](
      Snapshots.versionAt(spark, t, before))
    // vacuum the prefix: the instant now resolves out-of-retention
    Snapshots.commit(Seq((3L, 3L)).toDF("k", "v"), t)
    Snapshots.vacuum(spark, t, keepVersions = 1, orphanGraceMs = 0L)
    intercept[Snapshots.OutOfRetentionException](
      Snapshots.versionAt(spark, t, mid))
  }

  test("cloneShallow carries renames and partition specs: a clone of a " +
      "renamed, partly-partitioned source reads under the current " +
      "contract with partition values intact") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    def nullable(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(df.rdd, org.apache.spark.sql.types.StructType(
        df.schema.map(_.copy(nullable = true))))
    Snapshots.commit(nullable((1L to 4L).map(k => (k, s"p${k % 2}", k * 10L))
      .toDF("k", "g", "v")), src)
    Snapshots.commitPartitioned(
      nullable((5L to 8L).map(k => (k, s"p${k % 2}", k * 10L))
        .toDF("k", "g", "v")), src, Seq("g"))
    Snapshots.renameColumn(spark, src, "v", "w")
    Snapshots.cloneShallow(spark, src, dst)
    val got = Snapshots.read(spark, dst).select("k", "g", "w")
    val expect = (1L to 8L).map(k => (k, s"p${k % 2}", k * 10L))
      .toDF("k", "g", "w")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "clone must resolve the rename mapping AND the partitioned " +
        "external's path values")
  }
}
