package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join on a key where one value carries a large share of
  * the rows puts that whole share in ONE reducer task — at 100 TB a single
  * straggler partition stalls the stage. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`, on in [[graft.GraftSession]]) handles
  * this for sort-merge joins at runtime; explicit salting remains the tool
  * where AQE can't reach: streaming joins, aggregation-then-join pipelines,
  * or when the skewed side must stay hash-partitioned for a downstream op.
  *
  * Shape: the skewed (big) side gets a deterministic per-row salt in
  * `[0, saltFactor)`; the small side is replicated `saltFactor`× with an
  * exploded salt column; the join key becomes `(key, salt)`, spreading each
  * hot key over `saltFactor` reducers. Replication multiplies the small
  * side's shuffle volume — pick `saltFactor` ≈ (rows of hottest key) /
  * (rows a single task should own), and keep the replicated side the
  * genuinely small one.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `bigKey === smallKey`, salted `saltFactor`
    * ways. Inner joins only (salting a null-producing side changes outer
    *-join semantics). Result columns = big.* then small.* (the salt and
    * replicated key are dropped).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    // deterministic per-row salt: hash of the whole row, not rand() — reruns
    // and speculative task retries must salt identically
    val bigCols = big.columns.map(big(_))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigCols.toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
      // drop the replicated side's key too (it equals bigKey by the join
      // condition) so same-named keys don't leave an ambiguous duplicate
      // column behind — matching what df.join(..., Seq(key)) would produce
      .drop(replicated(smallKey))
  }

  /** SKEW-AWARE join advisor — [[saltedEquiJoin]] behind a measured
    * decision, composed the way [[Dedup.adaptiveJaccardPairs]] composes
    * its two exact branches: profile the big side's join key with
    * [[Profile.keySkewProfile]] (per-key counts are one partial-
    * aggregable shuffle; the profile is ONE row to the driver), then
    * pick the plain shuffle join when the hottest key's row share is
    * below `top1Threshold` and the salted join when it is above —
    * `top1_share` IS the straggler bound (one reducer owns at least
    * that fraction of the big side), so the threshold is "the largest
    * single-task share this cluster tolerates". Both branches are
    * exact inner joins with identical output columns, so the choice is
    * invisible in results — the q49 gate replays the plain SQL join and
    * must pass whichever branch fires.
    *
    * At 100 TB run the profile on a row sample (`statsEveryNth` > 1:
    * keeps rows whose full-row hash ≡ 0 mod n — uniform row thinning
    * scales every key's count ~1/n, so the SHARE estimate is unbiased;
    * sampling keys instead would drop the hot key entirely with
    * probability 1−1/n). The sample only feeds the decision; the join
    * runs on the full input either way.
    */
  def adaptiveEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltFactor: Int, top1Threshold: Double = 0.05,
      statsEveryNth: Int = 1): DataFrame = {
    require(top1Threshold > 0 && statsEveryNth >= 1,
      s"bad advisor params: top1Threshold=$top1Threshold statsEveryNth=$statsEveryNth")
    val statsIn =
      if (statsEveryNth == 1) big
      else {
        val cols = big.columns.map(big(_))
        big.filter(pmod(xxhash64(cols.toIndexedSeq: _*), lit(statsEveryNth)) === 0)
      }
    val top1Share = Profile.keySkewProfile(statsIn, bigKey)
      .select(col("top1_share")).head().getDouble(0)
    if (top1Share > top1Threshold)
      saltedEquiJoin(big, small, bigKey, smallKey, saltFactor)
    else
      big.join(small, big(bigKey) === small(smallKey)).drop(small(smallKey))
  }

  /** Two-phase ("partial-then-final") aggregation for skewed group keys
    * where the aggregate buffer itself is the problem (e.g.
    * `collect_set`-style or high-cardinality distinct counts, which
    * map-side partial aggregation does NOT shrink): first aggregate by
    * `(key, salt)`, then merge the per-salt partials by `key`.
    *
    * `partial` computes a mergeable sub-aggregate on each salted shard;
    * `merge` combines the shard results. Algebraic aggs (sum/count/min/max)
    * don't need this — Spark's hash aggregate already combines map-side.
    */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val cols = df.columns.map(df(_))
    df.withColumn("__salt",
        pmod(xxhash64(cols.toIndexedSeq: _*), lit(saltFactor)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
  }
}
