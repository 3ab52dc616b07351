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
