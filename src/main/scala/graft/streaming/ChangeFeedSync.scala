package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** CHANGE-FEED-AS-SOURCE: continuous incremental view maintenance over a
  * [[graft.io.Snapshots]] table — the Delta `readChangeFeed` streaming
  * shape, hand-rolled over the manifest chain. A micro-batch driver
  * (`foreachBatch` on any clock stream) calls [[syncViewOnce]] per tick;
  * each call folds the source's change feed `(cursor, latest]` into a
  * PERSISTED aggregate view and advances the cursor — so a derived view
  * of a 100 TB table is maintained at O(changed rows) per sync, never
  * O(table), and survives driver restarts.
  *
  * The VERSION WATERMARK is self-contained in the view table: every sync
  * commits the new view state stamped `to_v = <source version consumed>`,
  * and the cursor is recovered as `max(to_v)` from the view's LATEST
  * version — no side-channel checkpoint file whose loss would desync
  * view and cursor. Idempotency is the snapshot CAS itself:
  * [[Snapshots.commitIfAbsent]] keyed `(writerId, sourceVersion)` makes
  * a replayed tick (Structured Streaming's at-least-once `foreachBatch`
  * retry, or a full fresh-checkpoint replay) a no-op — the txn tag for
  * that source version is already in the view chain. Single maintainer
  * per `writerId` (the Delta `txn` contract): concurrent syncs of the
  * SAME view must share a writerId, and the CAS serializes them.
  *
  * View-state cost model: each sync appends one GROUP-SCALE state frame
  * (the aggregate's cardinality, not the source's); reads take only the
  * newest state (`to_v = cursor`). Periodic [[Snapshots.vacuum]] +
  * [[Snapshots.compactSmall]] bound the chain exactly as for any
  * append-heavy table.
  *
  * Reference scope: the reference pipeline recomputes its outputs from
  * scratch per run (`etl/transform.py:47-69`); this op is the
  * at-scale replacement — fold only what changed.
  */
object ChangeFeedSync {

  /** The view's cursor: the source version the PERSISTED view state has
    * folded up to — 0 when no sync has landed yet. Read from the view
    * table's MANIFEST properties, not from the state rows: a sync whose
    * folded state is EMPTY (a delete wiped every group) commits zero
    * rows, and a row-derived `max(to_v)` would regress to the previous
    * sync — the next sync would then double-fold the range. Manifest
    * props survive empty states; reading them is metadata-scale.
    */
  def cursorOf(s: SparkSession, viewTable: String): Int = {
    val latest = Snapshots.latestVersion(s, viewTable)
    // NEWEST-FIRST, stop at the first version carrying the prop: sync
    // cursors are monotone in view version (each sync's CAS serializes
    // on the chain), maintenance commits carry no props and skip, and
    // vacuumed manifests read as absent — so a long-lived view pays
    // O(1) manifest reads per sync, not O(sync history)
    (latest to 1 by -1).iterator
      .map { v =>
        try Snapshots.propsOf(s, viewTable, v).get(CursorProp)
        catch { case _: java.io.FileNotFoundException => None }
      }
      .collectFirst { case Some(c) => c.toInt }
      .getOrElse(0)
  }

  private val CursorProp = "cdf_cursor"

  /** The current materialized view: the newest persisted state frame
    * `(keyCol, n, sum_v)` — empty (correctly-typed) before the first
    * sync. Reads through the manifest's `to_v` stats ([[syncViewOnce]]
    * commits them), so a view with thousands of accumulated sync
    * states opens ONE directory, not the chain — the same pruning
    * contract as any stats-committed table, advisory and exact.
    */
  def currentView(s: SparkSession, viewTable: String,
      keyCol: String): DataFrame = {
    val cursor = cursorOf(s, viewTable)
    if (cursor == 0)
      emptyState(s, keyCol)
    else Snapshots.readPruned(s, viewTable, "to_v",
        cursor.toLong, cursor.toLong).df
      .select(col(keyCol), col("n"), col("sum_v"))
  }

  private def emptyState(s: SparkSession, keyCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField(keyCol, LongType),
        StructField("n", LongType), StructField("sum_v", LongType))))
  }

  /** ONE idempotent sync step: fold the source's change feed
    * `(cursor, latest]` into the view table via
    * [[graft.ops.Cdc.incrementalAgg]] (count + sum per key — the Z-set
    * fold), commit the new state stamped with the consumed source
    * version, CAS-deduped on `(writerId, latest)`.
    *
    * @return Some((fromV, toV)) when this call advanced the view;
    *         None when there was nothing new or the sync for this
    *         source version already landed (replay / concurrent twin)
    */
  def syncViewOnce(s: SparkSession, sourceTable: String, viewTable: String,
      writerId: String, keyCol: String, valCol: String): Option[(Int, Int)] = {
    val latest = Snapshots.latestVersion(s, sourceTable)
    val cursor = cursorOf(s, viewTable)
    if (latest <= cursor) return None
    val state = currentView(s, viewTable, keyCol)
    val delta = Snapshots.changeFeed(s, sourceTable, cursor + 1, latest)
      .select(when(col("_change_type") === "insert", "I")
        .otherwise("D").as("op"), col(keyCol), col(valCol))
    val next = graft.ops.Cdc.incrementalAgg(state, delta, keyCol, "op", valCol)
      .withColumn("to_v", lit(latest))
    // the commit IS the watermark advance: state rows, the cursor (a
    // manifest property, robust to an EMPTY folded state), the `to_v`
    // dir stats [[currentView]] prunes on, and the txn tag publish in
    // one atomic claim — replay window closed
    Snapshots.commitIfAbsent(next, viewTable, writerId, latest.toLong,
        props = Map(CursorProp -> latest.toString),
        statsCols = Seq("to_v"))
      .map(_ => (cursor + 1, latest))
  }

  /** ROW-LEVEL TABLE REPLICATION off the change feed — the canonical
    * CDF consumer (the Delta "CDC apply into a downstream table"
    * recipe): one call folds the source's feed range `(cursor, latest]`
    * into an exact replica table, so keeping a 100 TB table's copy in
    * sync costs O(changed rows) per sync, never a re-copy.
    *
    * Per sync: the range's events collapse to ONE outcome per key —
    * last writer wins (keys are unique per version; within a merge
    * version the postimage insert outranks its paired preimage delete)
    * — then net deletes apply via [[Snapshots.deleteKeysCow]] (a
    * distributed key-frame semi-join; CoW so no tombstone blocks a
    * later re-insert of the key) and net upserts via
    * [[Snapshots.mergeUpsert]], which carries the advanced cursor as
    * its commit property. First sync of an empty replica is a plain
    * initial-load commit.
    *
    * Delivery contract: AT-LEAST-ONCE, CONVERGENT. The cursor rides
    * the LAST commit of the sync, so a crash between the delete and
    * the merge replays the whole range — the replayed delete finds no
    * matching keys (no-op) and the replayed merge re-asserts the same
    * postimages (same final state); the replica's own feed may then
    * carry extra self-cancelling events, the standard price of
    * non-transactional two-step apply.
    *
    * SCHEMA SCOPE: upserts normalize to the source's committed column
    * ORDER (feed frames order by emitting part, and a partitioned
    * append surfaces its partition column last). A source
    * `renameColumn` is NOT propagated — the next sync refuses loudly
    * against the replica's schema contract (recreate the replica, or
    * rename it first); additive source evolution likewise requires
    * evolving the replica before the range containing the new column
    * syncs.
    *
    * @return Some((fromV, toV)) when the replica advanced; None at head
    */
  def replicateOnce(s: SparkSession, sourceTable: String,
      replicaTable: String, keyCol: String): Option[(Int, Int)] = {
    import org.apache.spark.sql.expressions.Window
    val latest = Snapshots.latestVersion(s, sourceTable)
    val cursor = cursorOf(s, replicaTable)
    if (latest <= cursor) return None
    val feed = Snapshots.changeFeed(s, sourceTable, cursor + 1, latest)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val last = feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .localCheckpoint()
    val meta = Seq("_change_type", "_commit_version", "_commit_props", "__rn")
    // normalize to the SOURCE's committed column order: feed frames
    // order columns by whichever part emitted first, and a partitioned
    // append surfaces its partition column LAST (Hive discovery) — a
    // feed-order frame would trip the replica's strict schema contract
    val contractCols = Snapshots.schemaOf(s, sourceTable, latest)
      .map(d => org.apache.spark.sql.types.StructType.fromDDL(d)
        .fieldNames.toSeq)
    val upserts0 = last.filter(col("_change_type") === "insert")
      .drop(meta: _*)
    val upserts = contractCols match {
      case Some(cs) if cs.toSet == upserts0.columns.toSet =>
        upserts0.select(cs.map(col): _*)
      case _ => upserts0
    }
    val cursorProps = Map(CursorProp -> latest.toString)
    if (Snapshots.latestVersion(s, replicaTable) < 1) {
      // initial load: the folded range IS the table
      Snapshots.commit(upserts, replicaTable, props = cursorProps): Unit
    } else {
      val delKeys = last.filter(col("_change_type") === "delete")
        .select(col(keyCol))
      Snapshots.deleteKeysCow(s, replicaTable, delKeys, keyCol): Unit
      Snapshots.mergeUpsert(s, replicaTable, upserts, keyCol,
        props = cursorProps): Unit
    }
    Some((cursor + 1, latest))
  }
}
