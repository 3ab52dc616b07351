package graft.streaming

import graft.SparkSpec
import graft.io.Snapshots
import org.apache.spark.sql.functions._

class ChangeFeedSyncSpec extends SparkSpec {

  private def fresh(name: String): String =
    s"/tmp/graft_io/cfsync/${java.util.UUID.randomUUID()}/$name"

  test("syncViewOnce: folds appends and deletes incrementally, " +
      "no-ops at the head, recovers its cursor from the view table") {
    import spark.implicits._
    val src = fresh("src")
    val view = fresh("view")
    def direct() = Snapshots.read(spark, src)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("cents").as("sum_v"))
    def current() = ChangeFeedSync.currentView(spark, view, "grp")
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    // two appends → one sync folds the range 1..2
    Snapshots.commit((1L to 30L).map(k => (k, k % 3, k * 10L))
      .toDF("k", "grp", "cents"), src)
    Snapshots.commit((31L to 50L).map(k => (k, k % 3, k * 10L))
      .toDF("k", "grp", "cents"), src)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((1, 2)))
    assert(ChangeFeedSync.cursorOf(spark, view) == 2)
    assert(same(current(), direct()))
    // nothing new → None, view untouched
    assert(ChangeFeedSync.syncViewOnce(
      spark, src, view, "w", "grp", "cents").isEmpty)
    assert(Snapshots.latestVersion(spark, view) == 1)
    // a MoR delete then a CoW delete fold through one more sync
    val (_, nDel) = Snapshots.deleteWhereMoR(spark, src, "k",
      col("k") % 7 === 0)
    assert(nDel > 0)
    Snapshots.deleteWhere(spark, src, col("k") % 5 === 0)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((3, 4)))
    assert(same(current(), direct()))
    // the cursor is durable state: a "restarted driver" (fresh call
    // chain, no in-memory state) resumes from the view table alone
    Snapshots.commit(Seq((1000L, 0L, 77L)).toDF("k", "grp", "cents"), src)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((5, 5)))
    assert(ChangeFeedSync.cursorOf(spark, view) == 5)
    assert(same(current(), direct()))
    // view-table versions = number of effective syncs, each txn-tagged
    assert(Snapshots.latestVersion(spark, view) == 3)
    // the current state opens ONE of the three accumulated state dirs —
    // the to_v dir stats each sync commits make currentView O(1) dirs
    val scan = Snapshots.readPruned(spark, view, "to_v", 5L, 5L)
    assert(scan.dirsTotal == 3 && scan.dirsRead == 1,
      s"state read ${scan.dirsRead}/${scan.dirsTotal} dirs (want 1/3)")
  }

  test("both consumers converge through a RESTORE: the rollback's " +
      "merge-kind feed folds into the view and the replica exactly") {
    import spark.implicits._
    val src = fresh("src_restore")
    val view = fresh("view_restore")
    val rep = fresh("rep_restore")
    def direct() = Snapshots.read(spark, src)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("cents").as("sum_v"))
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    Snapshots.commit((1L to 30L).map(k => (k, k % 3, k * 10L))
      .toDF("k", "grp", "cents"), src)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((1, 1)))
    assert(ChangeFeedSync.replicateOnce(spark, src, rep, "k")
      .contains((1, 1)))
    // a poison batch lands AND a CoW delete mangles old rows, then one
    // restore rolls both back — the consumers see insert@2, the
    // delete's preimages@3, and the restore's merge events@4
    Snapshots.commit((1001L to 1010L).map(k => (k, k % 3, 1L))
      .toDF("k", "grp", "cents"), src)
    Snapshots.deleteWhere(spark, src, col("k") % 4 === 0)
    assert(Snapshots.restoreTo(spark, src, 1).contains(4))
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((2, 4)))
    assert(same(ChangeFeedSync.currentView(spark, view, "grp"), direct()),
      "view must fold the poison batch + delete + restore to the " +
        "restored aggregate")
    assert(ChangeFeedSync.replicateOnce(spark, src, rep, "k")
      .contains((2, 4)))
    val repDf = Snapshots.read(spark, rep).select("k", "grp", "cents")
    val srcDf = Snapshots.read(spark, src).select("k", "grp", "cents")
    assert(same(repDf, srcDf),
      "replica must converge to the restored state")
  }

  test("syncViewOnce: empty view before first sync has the right schema") {
    val view = fresh("view_empty")
    val cur = ChangeFeedSync.currentView(spark, view, "grp")
    assert(cur.columns.toSeq == Seq("grp", "n", "sum_v") && cur.count() == 0)
    assert(ChangeFeedSync.cursorOf(spark, view) == 0)
  }

  test("concurrent sync twins: two maintainers racing the same range " +
      "commit exactly once — the CAS txn tag no-ops the loser") {
    import spark.implicits._
    val src = fresh("src_race")
    val view = fresh("view_race")
    Snapshots.commit((1L to 40L).map(k => (k, k % 4, k))
      .toDF("k", "grp", "cents"), src)
    // both workers observe cursor 0 and target source version 1; the
    // (writerId, sourceVersion) tag makes the duplicate a no-op even
    // though both computed a full state
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val results = Await.result(Future.sequence((1 to 2).map(_ => Future {
      ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
    })), 120.seconds)
    assert(results.count(_.isDefined) == 1,
      s"expected exactly one winning sync, got $results")
    assert(Snapshots.latestVersion(spark, view) == 1)
    val got = ChangeFeedSync.currentView(spark, view, "grp")
    val direct = Snapshots.read(spark, src)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("cents").as("sum_v"))
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }

  test("replicateOnce: exact row-level replica through deletes, updates, " +
      "re-inserts of deleted keys, and delete-only ranges") {
    import spark.implicits._
    val src = fresh("rep_src")
    val dst = fresh("rep_dst")
    def srcDf = Snapshots.read(spark, src).select("k", "s")
    def dstDf = Snapshots.read(spark, dst).select("k", "s")
    def inSync() =
      srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty
    // initial load from two appends
    Snapshots.commit((1L to 10L).map(k => (k, s"r$k")).toDF("k", "s"), src)
    Snapshots.commit((11L to 20L).map(k => (k, s"r$k")).toDF("k", "s"), src)
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((1, 2)))
    assert(inSync())
    // a CoW delete + a merge (update 5..8, re-insert deleted key 3,
    // fresh key 100) fold in one range
    Snapshots.deleteWhere(spark, src, col("k") <= 4L)
    Snapshots.mergeUpsert(spark, src,
      ((5L to 8L).map(k => (k, s"u$k")) :+ ((3L, "back")) :+ ((100L, "new")))
        .toDF("k", "s"), "k")
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((3, 4)))
    assert(inSync())
    assert(dstDf.as[(Long, String)].collect().toMap.get(3L).contains("back"))
    // delete-only range (empty upsert set) still advances the cursor
    Snapshots.deleteWhere(spark, src, col("k") === 100L)
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((5, 5)))
    assert(inSync())
    // at head: no-op
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isEmpty)
    // crash-replay convergence: wipe the cursor's effect by re-applying
    // the last range manually — the delete finds nothing, the merge
    // re-asserts the same rows, the replica state is unchanged
    val before = dstDf.collect().map(_.toSeq).toSet
    Snapshots.deleteKeysCow(spark, dst,
      Seq(100L).toDF("k"), "k")
    assert(dstDf.collect().map(_.toSeq).toSet == before)
  }

  test("replicateOnce propagates CHECK constraints like schema: drops " +
      "converge before the fold, adds after it, and a violating source " +
      "write never reaches a constrained replica unvalidated") {
    import spark.implicits._
    val src = fresh("rep_chk_src")
    val dst = fresh("rep_chk_dst")
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), src)
    Snapshots.addCheck(spark, src, "v-pos", "v > 0")
    // bootstrap: the replica inherits the constraint with its data
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isDefined)
    assert(Snapshots.checksOf(spark, dst) == Map("v-pos" -> "v > 0"))
    // the replica's constraint binds its own direct writers too (the
    // replica's bootstrap contract is nullable — match it, so the
    // refusal is the CHECK, not schema drift)
    assert(intercept[IllegalArgumentException](
      Snapshots.commit(Seq((Option(99L), Option(-1L))).toDF("k", "v"), dst))
      .getMessage.contains("v-pos"))
    // incremental: a second constraint added at the source rides the
    // next sync (converged after the fold, when the states match)
    Snapshots.mergeUpsert(spark, src, Seq((2L, 222L)).toDF("k", "v"), "k")
    Snapshots.addCheck(spark, src, "k-pos", "k > 0")
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isDefined)
    assert(Snapshots.checksOf(spark, dst) ==
      Map("v-pos" -> "v > 0", "k-pos" -> "k > 0"))
    val srcDf = Snapshots.read(spark, src).select("k", "v")
    val dstDf = Snapshots.read(spark, dst).select("k", "v")
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty)
    // a source-side drop converges the replica's set on the next sync
    Snapshots.dropCheck(spark, src, "v-pos")
    Snapshots.mergeUpsert(spark, src, Seq((3L, 333L)).toDF("k", "v"), "k")
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isDefined)
    assert(Snapshots.checksOf(spark, dst) == Map("k-pos" -> "k > 0"))
  }

  test("replicateOnce never wedges on a constraint added after the " +
      "source cleaned its own violators: the add converges AFTER the " +
      "fold, when the replica state equals the source's") {
    import spark.implicits._
    val src = fresh("rep_wedge_src")
    val dst = fresh("rep_wedge_dst")
    // v1: a corpus that VIOLATES the future constraint (v = 0 rows)
    Snapshots.commit((1L to 10L).map(k => (k, if (k % 3 == 0) 0L else k))
      .toDF("k", "v"), src)
    // replica bootstraps at v1 — it now holds the violating rows too
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k")
      .contains((1, 1)))
    // v2: the source deletes its violators; v3: the constraint lands
    // (addCheck validates the source's now-clean state and passes)
    Snapshots.deleteWhere(spark, src, col("v") === 0L)
    Snapshots.addCheck(spark, src, "v-pos", "v > 0")
    // the replica's cursor is at 1 and its state still holds v = 0
    // rows: an add-BEFORE-fold ordering re-validates that stale state,
    // refuses, and wedges replication permanently — the fold-first
    // ordering applies the delete range, THEN adds against the clean
    // converged state
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k")
      .contains((2, 3)))
    assert(Snapshots.checksOf(spark, dst) == Map("v-pos" -> "v > 0"))
    val srcDf = Snapshots.read(spark, src).select("k", "v")
    val dstDf = Snapshots.read(spark, dst).select("k", "v")
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty)
    // and a retry no-ops cleanly (the tag) while the set stays converged
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isEmpty)
    assert(Snapshots.checksOf(spark, dst) == Map("v-pos" -> "v > 0"))
  }

  test("replicateOnce recovers a crash between its apply and its check " +
      "adds AT HEAD: a drained poll (cursor already = latest) still " +
      "converges the replica's CHECK set") {
    import spark.implicits._
    val src = fresh("rep_head_src")
    val dst = fresh("rep_head_dst")
    Snapshots.commit((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"), src)
    Snapshots.addCheck(spark, src, "v-pos", "v > 0")
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isDefined)
    assert(Snapshots.checksOf(spark, dst) == Map("v-pos" -> "v > 0"))
    // simulate the crash window: the apply landed (cursor = latest) but
    // the adds did not — the replica is missing a source CHECK while
    // the source sits at head, so nothing would ever advance the cursor
    Snapshots.dropCheck(spark, dst, "v-pos")
    assert(Snapshots.checksOf(spark, dst).isEmpty)
    // the drained poll returns None (no range) but converges the set —
    // direct writes to the replica are validated again immediately,
    // not only after the source's next commit
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isEmpty)
    assert(Snapshots.checksOf(spark, dst) == Map("v-pos" -> "v > 0"))
    assert(intercept[IllegalArgumentException](
      Snapshots.commit(Seq((Option(99L), Option(-1L))).toDF("k", "v"), dst))
      .getMessage.contains("v-pos"))
  }

  test("replicateOnce is exactly-once: a replayed range no-ops on the " +
      "txn tag, and the replica's own feed carries no self-cancelling " +
      "delete+insert pairs") {
    import spark.implicits._
    val src = fresh("rep_once_src")
    val dst = fresh("rep_once_dst")
    Snapshots.commit((1L to 20L).map(k => (k, k * 10L)).toDF("k", "v"), src)
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((1, 1)))
    Snapshots.deleteWhere(spark, src, col("k") <= 3L)
    Snapshots.mergeUpsert(spark, src,
      Seq((5L, 555L), (100L, 1000L)).toDF("k", "v"), "k")
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((2, 3)))
    val versions = Snapshots.latestVersion(spark, dst)
    assert(versions == 2, s"one bootstrap + ONE atomic apply, got $versions")
    // replay the applied range directly (the crash-after-claim path):
    // same writer tag, same source version → no-op before any writes
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").isEmpty)
    assert(Snapshots.latestVersion(spark, dst) == 2)
    // the replica's own change feed is CLEAN: within every version, no
    // delete+insert pair carries identical values (the two-commit
    // apply's replayed-merge signature)
    val repFeed = Snapshots.changeFeed(spark, dst, 1, versions)
    val dels = repFeed.filter(col("_change_type") === "delete")
      .select("_commit_version", "k", "v")
    val ins = repFeed.filter(col("_change_type") === "insert")
      .select("_commit_version", "k", "v")
    assert(dels.join(ins, Seq("_commit_version", "k", "v")).count() == 0,
      "replica feed carries self-cancelling delete+insert pairs")
    // and the feed's net effect IS the source's net change set
    val srcDf = Snapshots.read(spark, src).select("k", "v")
    val dstDf = Snapshots.read(spark, dst).select("k", "v")
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty)
  }

  test("a cursor behind the source's vacuum horizon raises the typed " +
      "out-of-retention error; re-bootstrap recovers") {
    import spark.implicits._
    val src = fresh("ret_src")
    val dst = fresh("ret_dst")
    Snapshots.commit((1L to 10L).map(k => (k, k)).toDF("k", "v"), src)
    Snapshots.commit((11L to 20L).map(k => (k, k)).toDF("k", "v"), src)
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((1, 2)))
    // the source moves on and vacuums past the replica's cursor
    (1 to 3).foreach(i => Snapshots.commit(
      Seq((100L + i, 0L)).toDF("k", "v"), src))
    Snapshots.vacuum(spark, src, keepVersions = 2, orphanGraceMs = 0L)
    val e = intercept[Snapshots.OutOfRetentionException](
      ChangeFeedSync.replicateOnce(spark, src, dst, "k"))
    assert(e.table == src && e.requested == 3 && e.firstAvailable == 5,
      s"got requested=${e.requested} firstAvailable=${e.firstAvailable}")
    assert(e.getMessage.contains("re-bootstrap"))
    // recovery contract: drop the replica, bootstrap from the CURRENT
    // snapshot (no history needed), resume incrementally
    val f = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(dst), true)
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((1, 5)))
    assert(ChangeFeedSync.cursorOf(spark, dst) == 5)
    Snapshots.commit(Seq((200L, 1L)).toDF("k", "v"), src)
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((6, 6)))
    val srcDf = Snapshots.read(spark, src).select("k", "v")
    val dstDf = Snapshots.read(spark, dst).select("k", "v")
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty)
  }

  test("a consumer whose own prop-carrying manifests were vacuumed " +
      "refuses to re-fold from version 1 — re-bootstrap, not double-count") {
    import spark.implicits._
    val src = fresh("guard_src")
    val view = fresh("guard_view")
    Snapshots.commit((1L to 10L).map(k => (k, k % 2, k))
      .toDF("k", "grp", "cents"), src)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((1, 1)))
    Snapshots.commit((11L to 20L).map(k => (k, k % 2, k))
      .toDF("k", "grp", "cents"), src)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((2, 2)))
    // a maintenance-only retention window: compaction (carries no
    // cursor prop) becomes the only retained manifest
    Snapshots.compactSmall(spark, view, smallBytes = 1L << 30)
    Snapshots.vacuum(spark, view, keepVersions = 1, orphanGraceMs = 0L)
    assert(ChangeFeedSync.cursorOf(spark, view) == 0)
    Snapshots.commit(Seq((21L, 1L, 5L)).toDF("k", "grp", "cents"), src)
    val e = intercept[IllegalStateException](
      ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents"))
    assert(e.getMessage.contains("Re-bootstrap"))
  }

  test("additive source evolution propagates through replication; a " +
      "rename refuses loudly") {
    import spark.implicits._
    val src = fresh("evo_src")
    val dst = fresh("evo_dst")
    def nullable(df: org.apache.spark.sql.DataFrame) =
      spark.createDataFrame(df.rdd, org.apache.spark.sql.types.StructType(
        df.schema.map(_.copy(nullable = true))))
    Snapshots.commit(nullable((1L to 10L).map(k => (k, k * 10L))
      .toDF("k", "v")), src)
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((1, 1)))
    // the source gains a column MID-RANGE: an evolved append plus a
    // post-evolution merge land before the next sync
    Snapshots.commit(nullable(Seq((100L, 1L, "x"), (101L, 2L, "y"))
      .toDF("k", "v", "tag")), src, allowEvolve = true)
    Snapshots.mergeUpsert(spark, src,
      nullable(Seq((5L, 555L, "z")).toDF("k", "v", "tag")), "k")
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((2, 3)))
    val srcDf = Snapshots.read(spark, src).select("k", "v", "tag")
    val dstDf = Snapshots.read(spark, dst).select("k", "v", "tag")
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty,
      "replica must converge through the additive evolution")
    // pre-evolution rows surface NULL in the new column on BOTH sides
    assert(Snapshots.read(spark, dst).filter($"k" === 1L && $"tag".isNull)
      .count() == 1)
    // a RENAME does not propagate: the next sync refuses loudly
    Snapshots.renameColumn(spark, src, "tag", "label")
    Snapshots.commit(nullable(Seq((200L, 9L, "w")).toDF("k", "v", "label")),
      src)
    val e = intercept[IllegalArgumentException](
      ChangeFeedSync.replicateOnce(spark, src, dst, "k"))
    assert(e.getMessage.contains("schema drift refused"))
  }

  test("bootstrap is a snapshot load, not a history fold: a fresh " +
      "replica of a heavily-vacuumed source still initial-loads") {
    import spark.implicits._
    val src = fresh("boot_src")
    val dst = fresh("boot_dst")
    (1 to 4).foreach(i => Snapshots.commit(
      ((i * 10L) to (i * 10L + 5L)).map(k => (k, k)).toDF("k", "v"), src))
    Snapshots.deleteWhere(spark, src, col("k") % 10 === 0)
    Snapshots.vacuum(spark, src, keepVersions = 1, orphanGraceMs = 0L)
    // a feed fold from v1 would need the expired manifests; the
    // snapshot bootstrap needs only the head
    assert(ChangeFeedSync.replicateOnce(spark, src, dst, "k").contains((1, 5)))
    val srcDf = Snapshots.read(spark, src).select("k", "v")
    val dstDf = Snapshots.read(spark, dst).select("k", "v")
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty)
  }

  test("an EMPTY folded state still advances the cursor — no double-fold " +
      "after a delete-everything range") {
    import spark.implicits._
    val src = fresh("src_wipe")
    val view = fresh("view_wipe")
    Snapshots.commit((1L to 10L).map(k => (k, k % 2, k))
      .toDF("k", "grp", "cents"), src)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((1, 1)))
    // v2 deletes EVERY row → the folded state is zero groups; the
    // committed state dir has no parquet files, and the cursor must
    // come from the manifest (rows would regress it to 1)
    Snapshots.deleteWhere(spark, src, lit(true))
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((2, 2)))
    assert(ChangeFeedSync.cursorOf(spark, view) == 2)
    assert(ChangeFeedSync.currentView(spark, view, "grp").count() == 0)
    // a later append folds ONLY v3 — a regressed cursor would re-add
    // v1's rows on top and double every count
    Snapshots.commit((100L to 104L).map(k => (k, k % 2, k))
      .toDF("k", "grp", "cents"), src)
    assert(ChangeFeedSync.syncViewOnce(spark, src, view, "w", "grp", "cents")
      .contains((3, 3)))
    val got = ChangeFeedSync.currentView(spark, view, "grp")
    val direct = Snapshots.read(spark, src)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("cents").as("sum_v"))
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }
}
