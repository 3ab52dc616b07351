package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Generalized MERGE INTO — the full three-clause upsert statement
    * (SQL:2003 / Delta `MERGE`): `WHEN MATCHED [AND cond] THEN DELETE`,
    * `WHEN MATCHED [AND cond] THEN UPDATE SET ...`, `WHEN NOT MATCHED
    * [AND cond] THEN INSERT ...`, evaluated in that clause order per
    * matched pair; target rows with no source match always survive
    * unchanged (there is no NOT-MATCHED-BY-SOURCE clause here — that is
    * [[applyChanges]]'s delete op).
    *
    * Condition and assignment expressions reference the two sides via
    * the `t` / `s` aliases (`col("t.balance")`, `col("s.amount")`).
    * UPDATE assignments are partial — unassigned data columns keep the
    * target value; INSERT assignments must produce every data column
    * (unassigned ones become NULL, matching SQL INSERT defaults).
    *
    * CONTRACT (the Delta/SQL-standard cardinality rule): source must
    * have at most ONE row per key — two source matches for one target
    * row make the result order-dependent, so the standard errors. This
    * op enforces it DISTRIBUTED when `validate = true` (an aggregate on
    * the source's key — one extra partial-aggregable pass, skippable
    * when the source is already a keyed changelog).
    *
    * Scale shape: ONE key-partitioned full-outer join (the same posture
    * as [[applyChanges]] — with a key-bucketed target the big side never
    * shuffles); clause logic is a narrow `when` chain; no window, no
    * driver state.
    */
  def mergeInto(target: DataFrame, source: DataFrame, keyCols: Seq[String],
      matchedDeleteCond: Option[Column] = None,
      matchedUpdate: Option[(Option[Column], Map[String, Column])] = None,
      notMatchedInsert: Option[(Option[Column], Map[String, Column])] = None,
      validate: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    val dataCols = target.columns.filterNot(keyCols.contains).toSeq
    matchedUpdate.foreach { case (_, set) =>
      val unknown = set.keySet -- dataCols
      require(unknown.isEmpty, s"UPDATE SET on non-target columns: $unknown") }
    notMatchedInsert.foreach { case (_, vals) =>
      val unknown = vals.keySet -- dataCols
      require(unknown.isEmpty, s"INSERT on non-target columns: $unknown") }
    if (validate) {
      val dup = source.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
      require(dup == 0,
        "MERGE cardinality violation: multiple source rows match one key")
    }
    val t = target.withColumn("__t", lit(true)).as("t")
    val s = source.withColumn("__s", lit(true)).as("s")
    val onCond = keyCols.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, onCond, "full_outer")
    val matched = col("__t").isNotNull && col("__s").isNotNull
    val tOnly = col("__t").isNotNull && col("__s").isNull
    val delHit = matchedDeleteCond.map(matched && _).getOrElse(lit(false))
    val updHit = matchedUpdate.map { case (c, _) =>
      matched && !delHit && c.getOrElse(lit(true)) }.getOrElse(lit(false))
    val insHit = notMatchedInsert.map { case (c, _) =>
      col("__t").isNull && col("__s").isNotNull && c.getOrElse(lit(true)) }
      .getOrElse(lit(false))
    val keep = tOnly || (matched && !delHit) || insHit
    val keyOut = keyCols.map(k =>
      when(col("__t").isNotNull, col(s"t.$k")).otherwise(col(s"s.$k")).as(k))
    val dataOut = dataCols.map { c =>
      val updated = matchedUpdate.flatMap(_._2.get(c))
        .map(e => when(updHit, e)).getOrElse(when(lit(false), lit(null)))
      val inserted = notMatchedInsert
        .map(v => v._2.getOrElse(c, lit(null).cast(target.schema(c).dataType)))
        .getOrElse(lit(null))
      updated.when(insHit, inserted).otherwise(col(s"t.$c")).as(c)
    }
    joined.filter(keep).select(keyOut ++ dataOut: _*)
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

  /** POINT-IN-TIME dimension join — the warehouse enrichment step that
    * makes [[scd2History]] useful to facts: each fact row joins the
    * dimension version VALID AT ITS OWN timestamp (half-open
    * `[valid_from, valid_to)`, NULL `valid_to` = still open), so a
    * reprocessed fact from last March gets last March's dimension, not
    * today's — the join that prevents silent feature leakage in
    * training-data builds. Facts with no valid version (unknown key, a
    * timestamp before the first version, or inside a delete gap) keep
    * NULL dimension columns; zero-length same-ts superseded versions
    * can never match (`ts >= from AND ts < to` is empty).
    *
    * Scale shape: ONE key-partitioned join (equi on the key, the
    * interval as a residual predicate — never a theta join); SCD2
    * disjointness bounds matches at ≤ 1 per fact, so no fanout and no
    * dedup pass. With a key-bucketed dimension the big fact side is the
    * only shuffle.
    *
    * @return facts' columns + the dimension's payload columns (key and
    *         validity bounds dropped)
    */
  def pointInTimeJoin(facts: DataFrame, hist: DataFrame, keyCol: String,
      factTsCol: String, fromCol: String = "valid_from",
      toCol: String = "valid_to"): DataFrame = {
    val f = facts.as("f")
    val h = hist.as("h")
    val cond = col(s"f.$keyCol") === col(s"h.$keyCol") &&
      col(s"f.$factTsCol") >= col(s"h.$fromCol") &&
      (col(s"h.$toCol").isNull || col(s"f.$factTsCol") < col(s"h.$toCol"))
    val payload = hist.columns.filterNot(Set(keyCol, fromCol, toCol)).toSeq
    f.join(h, cond, "left")
      .select(facts.columns.toSeq.map(c => col(s"f.$c")) ++
        payload.map(c => col(s"h.$c")): _*)
  }

  /** Bitemporal version history — [[scd2History]] lifted to TWO time
    * axes: valid time (`tsCol` — when the fact was true in the world)
    * and transaction time (`txCol` — the ingestion batch in which the
    * warehouse learned it). Each batch that touches a key RESTATES that
    * key's full valid timeline as SCD2 over every change with
    * `tx ≤ batch`; the restatement's rows carry
    * `[tx_from = batch, tx_to = key's next touching batch)`. A
    * retroactive correction (same valid `ts`, higher `seq`, later `tx`)
    * therefore rewrites history WITHOUT destroying the audit trail: the
    * superseded timeline survives under its closed tx interval — the
    * property that makes "what did we believe on date T about date V"
    * answerable at all (the SQL:2011 system/application-time model,
    * reconstructed from a plain CDC log).
    *
    * Semantics: `op = 'D'` closes the prior version inside its
    * restatement and emits no row; same-`(ts)` versions order by `seq`
    * (superseded ones get zero-length valid intervals, exactly
    * [[scd2History]]'s contract); `is_current` = open on BOTH axes.
    *
    * Scale shape: the restatement expansion is ONE keyed join of the
    * change log against the per-key distinct batch list with a
    * `tx ≤ tx_from` prefix predicate — per-key fanout is bounded by
    * batches-per-key (the CDC compaction cadence, single digits in
    * practice, NEVER corpus-sized), so the output is at most
    * `changes × batches_per_key` rows. Both the batch lead and the
    * valid-interval lead are key-partitioned windows; nothing touches
    * the driver. Written `partitionBy(tx_from)`, the as-of filter
    * partition-prunes to one restatement.
    */
  def bitemporalHistory(changes: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, opCol: String, txCol: String): DataFrame = {
    val dataCols = changes.columns
      .filterNot(Set(keyCol, tsCol, seqCol, opCol, txCol)).toSeq
    val wb = Window.partitionBy(keyCol).orderBy(col(txCol))
    val batches = changes.select(col(keyCol), col(txCol)).distinct()
      .withColumn("tx_to", lead(col(txCol), 1).over(wb))
      .select(col(keyCol), col(txCol).as("tx_from"), col("tx_to"))
    val joined = changes.as("c").join(batches.as("b"),
        col(s"c.$keyCol") === col(s"b.$keyCol") &&
          col(s"c.$txCol") <= col("b.tx_from"))
      .select(col(s"c.$keyCol").as(keyCol) +:
        col(s"c.$tsCol").as(tsCol) +: col(s"c.$seqCol").as(seqCol) +:
        col(s"c.$opCol").as(opCol) +:
        dataCols.map(c => col(s"c.$c").as(c)) :+
        col("b.tx_from") :+ col("b.tx_to"): _*)
    val w = Window.partitionBy(col(keyCol), col("tx_from"))
      .orderBy(col(tsCol), col(seqCol))
    joined.withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(col(keyCol) +: dataCols.map(col) :+
        col(tsCol).as("valid_from") :+ col("valid_to") :+
        col(seqCol).as("version_seq") :+ col("tx_from") :+ col("tx_to") :+
        (col("valid_to").isNull && col("tx_to").isNull).as("is_current"): _*)
  }

  /** Point-in-time lookup over a [[bitemporalHistory]] frame: the rows
    * that were believed at transaction time `txAt` about valid time
    * `validAt` — half-open on both axes (`tx_from ≤ T < tx_to`,
    * `valid_from ≤ V < valid_to`, null = open). A pure filter: over a
    * `partitionBy(tx_from)` layout it partition-prunes to one
    * restatement before the scan.
    */
  def asOfBitemporal(hist: DataFrame, txAt: org.apache.spark.sql.Column,
      validAt: org.apache.spark.sql.Column): DataFrame =
    hist.filter(col("tx_from") <= txAt &&
      (col("tx_to").isNull || txAt < col("tx_to")) &&
      col("valid_from") <= validAt &&
      (col("valid_to").isNull || validAt < col("valid_to")))

  /** INCREMENTAL aggregate (materialized-view) maintenance — the
    * DBSP/Materialize Z-set idea reduced to its Spark-native core: a
    * keyed `(n, sum_v)` view is kept current under a CDC delta log by
    * treating every delta row as a SIGNED MULTIPLICITY (+1 insert, −1
    * delete), folding the log to per-key `(Δn, Δsum)` with ONE
    * partial-aggregable groupBy, and merging into the base view with
    * ONE key full-outer join. Cost is O(delta + touched keys) — never a
    * rescan of the corpus the view summarizes, which is the entire
    * point at 100 TB: the nightly delta is GBs while the base is the
    * lake.
    *
    * Count/sum (and any commutative-group aggregate) maintain exactly;
    * min/max/distinct do NOT fold under deletion (they need the d7-style
    * auxiliary structure) — callers wanting those compose with
    * [[applyChanges]] row-level instead.
    *
    * Keys whose maintained count reaches 0 leave the view (the group no
    * longer exists). NEGATIVE counts are deliberately kept visible:
    * they mean the log deleted rows the base never had — corruption a
    * silent clamp would hide, and which any recompute-equality gate
    * then catches loudly.
    *
    * @param baseAgg `(keyCol, n, sum_v)` — the view being maintained
    * @param delta   `(opCol ∈ {I, D}, keyCol, valCol)` — the CDC log
    */
  /** Incremental DISTINCT-count maintenance — the aggregate
    * [[incrementalAgg]] cannot fold (distinct is not a group under
    * deletion: dropping one copy of a value must not drop the value
    * while other copies survive). The classic fix, applied here: keep
    * the SUPPORT MULTISET `(key, value, cnt)` as the maintained
    * auxiliary artifact — itself just [[incrementalAgg]]'s Z-set algebra
    * keyed by `(key, value)` — and derive `n_distinct = |{value :
    * cnt > 0}|` with one partial-aggregable rollup over the support
    * table (distinct-values-sized, not corpus-sized). Same guarantees:
    * O(delta + touched pairs) maintenance, zero-count support rows
    * drop, over-deletes stay visible as negative counts.
    *
    * @param baseVc `(keyCol, valCol, cnt)` — the support multiset
    * @param delta  `(opCol ∈ {I, D}, keyCol, valCol)`
    * @return the maintained support multiset, same shape as `baseVc`
    */
  def incrementalDistinct(baseVc: DataFrame, delta: DataFrame, keyCol: String,
      opCol: String, valCol: String): DataFrame = {
    val d = delta.select(col(keyCol), col(valCol),
        when(col(opCol) === "I", lit(1L))
          .when(col(opCol) === "D", lit(-1L))
          .otherwise(raise_error(concat(lit("incrementalDistinct: unknown op '"),
            col(opCol), lit("'"))).cast("long")).as("__sgn"))
      .groupBy(col(keyCol), col(valCol))
      .agg(sum(col("__sgn")).as("__dc"))
    baseVc.select(col(keyCol), col(valCol), col("cnt"))
      .join(d, Seq(keyCol, valCol), "full_outer")
      .select(col(keyCol), col(valCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dc"), lit(0L))).as("cnt"))
      .filter(col("cnt") =!= 0L)
  }

  /** Incremental MIN/MAX maintenance — the canonical NON-INVERTIBLE
    * aggregate (deleting the current minimum tells you nothing about
    * the next one): like DISTINCT ([[incrementalDistinct]]), the
    * maintained artifact is the SUPPORT MULTISET `(key, value, cnt)`,
    * and min/max/distinct re-derive by one rollup over that
    * distinct-values-bounded table — when the minimum is deleted, its
    * successor is already in the support, no fact rescans ever.
    * Over-deleted values (negative support) are EXCLUDED from the
    * derive but surfaced in `n_negative`, so corruption stays visible
    * without poisoning the extrema.
    *
    * @return (key, min_v, max_v, n_distinct, n_negative)
    */
  def incrementalMinMax(baseVc: DataFrame, delta: DataFrame, keyCol: String,
      opCol: String, valCol: String): DataFrame =
    incrementalDistinct(baseVc, delta, keyCol, opCol, valCol)
      .groupBy(col(keyCol))
      .agg(min(when(col("cnt") > 0, col(valCol))).as("min_v"),
        max(when(col("cnt") > 0, col(valCol))).as("max_v"),
        sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("n_distinct"),
        sum(when(col("cnt") < 0, 1L).otherwise(0L)).as("n_negative"))

  def incrementalAgg(baseAgg: DataFrame, delta: DataFrame, keyCol: String,
      opCol: String, valCol: String): DataFrame = {
    val d = delta.select(col(keyCol),
        when(col(opCol) === "I", lit(1L))
          .when(col(opCol) === "D", lit(-1L))
          // an op that is neither I nor D is a malformed log — fail the
          // job loudly instead of silently skipping the row
          .otherwise(raise_error(concat(lit("incrementalAgg: unknown op '"),
            col(opCol), lit("'"))).cast("long")).as("__sgn"),
        col(valCol).cast("long").as("__v"))
      .groupBy(col(keyCol))
      .agg(sum(col("__sgn")).as("__dn"),
        sum(col("__sgn") * col("__v")).as("__dv"))
    baseAgg.select(col(keyCol), col("n"), col("sum_v"))
      .join(d, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as("sum_v"))
      .filter(col("n") =!= 0L)
  }
}
