package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply an out-of-order batch of row-level
  * changes (insert / update / delete) onto a keyed snapshot — the
  * lakehouse MERGE INTO, expressed as a declarative plan so Catalyst
  * plans the one wide edge (the full-outer key join) and AQE can pick
  * broadcast when the change batch is small, which it almost always is
  * relative to the snapshot.
  */
object Cdc {

  /** Latest-wins CDC apply.
    *
    * `changes` carries the snapshot's data columns plus `(tsCol, opCol,
    * seqCol)`; per key the winning change is the greatest `(ts, seq)`
    * (both descending — `seq` is the within-timestamp tiebreak, e.g. a
    * log offset, making the reduction deterministic under any arrival
    * order). Winning op 'D' deletes the key; anything else upserts the
    * change row's data columns wholesale — including its NULLs, which is
    * why the merge tests change-presence via `opCol IS NOT NULL` instead
    * of `coalesce` per column (a change that nulls a field must not
    * resurrect the snapshot value).
    *
    * Scale shape: one shuffle to reduce the change batch per key
    * (row_number window — the batch is the small relation), one
    * key-partitioned full-outer join against the snapshot. Both hash on
    * the same key, so with a pre-bucketed snapshot the join is
    * shuffle-free on the big side; nothing touches the driver.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, seqCol: String, opCol: String): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == keyCol).toSeq
    val missing = dataCols.filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes missing snapshot columns: $missing")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select((keyCol +: opCol +: dataCols).map(col): _*)
    val present = col(s"c.$opCol").isNotNull
    snapshot.as("s").join(latest.as("c"), Seq(keyCol), "full_outer")
      .filter(!present || col(s"c.$opCol") =!= "D")
      .select(col(keyCol) +: dataCols.map(c =>
        when(present, col(s"c.$c")).otherwise(col(s"s.$c")).as(c)): _*)
  }

  /** SCD Type-2 dimension history from the same change log
    * [[applyChanges]] consumes: instead of keeping only the latest
    * value, every non-delete change opens a VERSION valid from its
    * `(ts, seq)` until the key's next change (`valid_to` null = still
    * open); a delete closes the prior version and emits no row of its
    * own. `is_current` marks open versions — the slowly-changing-
    * dimension contract (Kimball type 2), the audit-trail complement to
    * the latest-wins merge.
    *
    * Same-timestamp versions are ordered by `seq` (the log offset), so
    * a superseded same-ts version gets a zero-length `[ts, ts)`
    * interval — present in the history (the log really carried it),
    * never matched by an as-of lookup.
    *
    * Scale shape: ONE key-partitioned window (the `lead` over
    * `(ts, seq)`) — no self-join, no driver state; history building is
    * embarrassingly key-parallel.
    */
  def scd2History(changes: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val dataCols = changes.columns
      .filterNot(Set(keyCol, tsCol, seqCol, opCol)).toSeq
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(seqCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(col(keyCol) +: dataCols.map(col) :+
        col(tsCol).as("valid_from") :+ col("valid_to") :+
        col(seqCol).as("version_seq") :+
        (col("valid_to").isNull).as("is_current"): _*)
  }
}
