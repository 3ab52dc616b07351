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

  /** A consumer table with COMMITTED VERSIONS but no retained cursor
    * property is a vacuum casualty, not a fresh consumer: every sync
    * commit records the cursor, so the only way to lose it is a
    * maintenance-only retention window expiring every prop-carrying
    * manifest. Folding "from version 1" against the surviving state
    * would DOUBLE-COUNT everything already folded — refuse loudly and
    * demand a re-bootstrap (the same recovery as
    * [[Snapshots.OutOfRetentionException]]).
    */
  private def requireCursorIntact(s: SparkSession, consumerTable: String,
      cursor: Int): Unit =
    if (cursor == 0 && Snapshots.latestVersion(s, consumerTable) >= 1)
      throw new IllegalStateException(
        s"$consumerTable has committed versions but no retained sync " +
          "cursor — vacuum expired every prop-carrying manifest; " +
          "re-folding from version 1 would double-count into the " +
          "surviving state. Re-bootstrap the consumer (drop and " +
          "recreate it), or retain at least one sync commit.")

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
    requireCursorIntact(s, viewTable, cursor)
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
    * BOOTSTRAP: an empty replica initial-loads from a SNAPSHOT READ of
    * the source at its current version (cursor set there in the same
    * commit) — never a feed fold from version 1, which would need every
    * historical manifest and break the moment the source vacuums. The
    * bootstrap commit is CAS-deduped on `(writerId, sourceVersion)`, so
    * twin bootstrappers land exactly one initial load.
    *
    * Per incremental sync: the range's events collapse to ONE outcome
    * per key — last writer wins (keys are unique per version; within a
    * merge version the postimage insert outranks its paired preimage
    * delete) — then net deletes AND net upserts apply as ONE atomic
    * commit via [[Snapshots.applyChangesCow]], carrying the advanced
    * cursor as its commit property and the `(writerId, sourceVersion)`
    * transaction tag in the same manifest claim.
    *
    * Delivery contract: EXACTLY-ONCE. Cursor, delete rewrite, upsert,
    * feed sidecars, and txn tag publish in one atomic claim — a crash
    * mid-sync leaves only GC-able orphans and the replay applies the
    * identical range once; a replay AFTER the claim (or a concurrent
    * twin) no-ops on the tag. The replica's own change feed therefore
    * never records self-cancelling delete+insert pairs — it is a
    * faithful re-emission of the source's net changes, consumable by a
    * further downstream tier.
    *
    * SCHEMA SCOPE: upserts normalize to the source's committed column
    * ORDER and WIDTH at the range head (feed frames order columns by
    * whichever part emitted first; rows from before an additive
    * evolution surface the new column as NULL). ADDITIVE source
    * evolution propagates automatically: the sync first evolves the
    * replica's contract (one metadata-scale empty commit with the new
    * nullable columns appended), then folds the range. A source
    * `renameColumn` (or a re-type) is NOT propagated — the sync refuses
    * loudly against the replica's schema contract (recreate the
    * replica, or rename it first). CHECK constraints propagate the
    * same way: the replica's `#check` set converges to the source's
    * before each apply, so the apply enforces exactly the source's
    * contract on the replicated rows.
    *
    * A cursor behind the source's vacuum horizon raises
    * [[Snapshots.OutOfRetentionException]] (re-bootstrap); a replica
    * whose own prop-carrying manifests were vacuumed refuses before
    * folding (see [[requireCursorIntact]]).
    *
    * @return Some((fromV, toV)) when the replica advanced; None at head
    *         or when this range's sync already landed (replay / twin)
    */
  /** Full set-convergence of the replica's CHECK constraints to the
    * source's at `srcVersion` — the drained-poll recovery shape: the
    * replica's state already equals source-at-srcVersion, so drops and
    * adds converge in one pass (mid-sync they must instead split
    * around the fold — see [[replicateOnce]]'s propagateCheck halves).
    */
  private def convergeChecks(s: SparkSession, sourceTable: String,
      replicaTable: String, srcVersion: Int): Unit = {
    val srcChecks = Snapshots.checksOf(s, sourceTable, Some(srcVersion))
    val repChecks = Snapshots.checksOf(s, replicaTable)
    (repChecks.keySet -- srcChecks.keySet)
      .foreach(n => Snapshots.dropCheck(s, replicaTable, n): Unit)
    srcChecks.foreach { case (n, e) =>
      if (!repChecks.get(n).contains(e)) {
        if (repChecks.contains(n)) Snapshots.dropCheck(s, replicaTable, n): Unit
        Snapshots.addCheck(s, replicaTable, n, e): Unit
      }
    }
  }

  def replicateOnce(s: SparkSession, sourceTable: String,
      replicaTable: String, keyCol: String): Option[(Int, Int)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StructType
    val latest = Snapshots.latestVersion(s, sourceTable)
    val repLatest = Snapshots.latestVersion(s, replicaTable)
    val cursor = cursorOf(s, replicaTable)
    requireCursorIntact(s, replicaTable, cursor)
    if (latest <= cursor) {
      // AT-HEAD CONVERGENCE is also the crash-recovery path for a sync
      // that died between its apply-commit (cursor already = latest)
      // and its post-fold check ADDS: the replica's state equals
      // source-at-latest, so adding here validates exactly what the
      // source's own addCheck proved — without it, direct writes to
      // the replica would go unvalidated until the source commits
      // again. Cost: two manifest header reads per drained poll.
      if (latest >= 1 && repLatest >= 1)
        convergeChecks(s, sourceTable, replicaTable, latest)
      return None
    }
    val cursorProps = Map(CursorProp -> latest.toString)
    val contract = Snapshots.schemaOf(s, sourceTable, latest)
      .map(StructType.fromDDL)
    // normalize a frame to the SOURCE's committed column order and
    // width: feed/read frames order columns by whichever part emitted
    // first, a partitioned append surfaces its partition column LAST
    // (Hive discovery), and rows predating an additive evolution lack
    // the appended columns entirely — fill those with typed NULLs
    def normalized(df: DataFrame): DataFrame = contract match {
      case Some(st) =>
        val have = df.columns.toSet
        val unknown = have -- st.fieldNames
        require(unknown.isEmpty,
          s"replicateOnce: feed column(s) ${unknown.mkString(", ")} not " +
            s"in $sourceTable's committed contract — cannot normalize")
        df.select(st.map(f =>
          if (have(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)): _*)
      case None => df
    }
    // CHECK constraints propagate like schema, SPLIT AROUND THE FOLD:
    // DROPS (and the drop half of a changed expression) converge
    // BEFORE the apply — a source that dropped a constraint may emit
    // rows the old expression refuses, and the apply must not enforce
    // a contract the source no longer has. ADDS converge AFTER the
    // feed range folds: addCheck validates the replica's EXISTING rows
    // (the addCheck contract), and the replica's pre-fold state may
    // legitimately still hold rows the source deleted BEFORE the
    // constraint landed (delete at v5, addCheck at v6, replica cursor
    // at 4) — adding first refuses forever and wedges replication;
    // adding after the fold validates exactly the source's own state,
    // which the source's addCheck already proved. The folded range's
    // rows themselves come from a source that enforced the new
    // constraint, so the weaker in-flight set never admits a violator.
    def propagateCheckDrops(): Unit = {
      val srcChecks = Snapshots.checksOf(s, sourceTable, Some(latest))
      val repChecks = Snapshots.checksOf(s, replicaTable)
      (repChecks.keySet -- srcChecks.keySet)
        .foreach(n => Snapshots.dropCheck(s, replicaTable, n): Unit)
      srcChecks.foreach { case (n, e) =>
        repChecks.get(n).foreach { old =>
          if (old != e) Snapshots.dropCheck(s, replicaTable, n): Unit
        }
      }
    }
    // idempotent (set convergence); a sync that died between its apply
    // and its adds recovers EITHER here (when the source advanced
    // again) or in the at-head [[convergeChecks]] pass above (when it
    // did not) — the replica never stays missing a source CHECK past
    // the next replicateOnce call
    def propagateCheckAdds(): Unit = {
      val srcChecks = Snapshots.checksOf(s, sourceTable, Some(latest))
      val repChecks = Snapshots.checksOf(s, replicaTable)
      srcChecks.foreach { case (n, e) =>
        if (!repChecks.get(n).contains(e))
          Snapshots.addCheck(s, replicaTable, n, e): Unit
      }
    }
    if (repLatest < 1) {
      // BOOTSTRAP: snapshot at `latest` — O(source-at-head), no history
      val landed = Snapshots.commitIfAbsent(
          normalized(Snapshots.read(s, sourceTable, Some(latest))),
          replicaTable, ReplicaWriter, latest.toLong, props = cursorProps)
        .map(_ => (cursor + 1, latest))
      // constraints ride AFTER the bootstrap commit (addCheck needs a
      // committed version to validate against, and the bootstrap state
      // IS source-at-latest — the adds validate what the source already
      // proved); idempotent on replay
      if (landed.isDefined) { propagateCheckDrops(); propagateCheckAdds() }
      return landed
    }
    // ADDITIVE source evolution propagates to the replica FIRST (an
    // idempotent metadata-scale commit: existing columns keep the
    // replica's contract, the new columns append nullable) so the
    // atomic apply below validates against the evolved contract;
    // renames/re-types fall through to applyChangesCow's loud refusal
    for {
      repDdl <- Snapshots.schemaOf(s, replicaTable, repLatest)
      srcSt <- contract
    } {
      val repSt = StructType.fromDDL(repDdl)
      val additive = srcSt.fields.length > repSt.fields.length &&
        srcSt.fields.take(repSt.fields.length).toSeq.zip(repSt.fields.toSeq)
          .forall { case (a, b) => a.name == b.name && a.dataType == b.dataType }
      if (additive) {
        val evolved = StructType(repSt.fields ++
          srcSt.fields.drop(repSt.fields.length).map(_.copy(nullable = true)))
        Snapshots.commit(s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), evolved),
          replicaTable, allowEvolve = true): Unit
      }
    }
    propagateCheckDrops()
    val feed = Snapshots.changeFeed(s, sourceTable, cursor + 1, latest)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val last = feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .localCheckpoint()
    val meta = Seq("_change_type", "_commit_version", "_commit_props", "__rn")
    val upserts = normalized(
      last.filter(col("_change_type") === "insert").drop(meta: _*))
    val delKeys = last.filter(col("_change_type") === "delete")
      .select(col(keyCol))
    val advanced = Snapshots.applyChangesCow(s, replicaTable, delKeys,
        upserts, keyCol, txn = Some((ReplicaWriter, latest.toLong)),
        props = cursorProps)
      .map(_ => (cursor + 1, latest))
    graft.ops.Checkpoints.free(last)
    // adds AFTER the fold: the replica now equals source-at-latest, so
    // the adds' existing-data validation passes exactly when the
    // source's own addCheck did. Runs on the replay path too (advanced
    // = None) — crash recovery for a sync that died mid-propagation.
    propagateCheckAdds()
    advanced
  }

  private val ReplicaWriter = "cdf-replica"
}
