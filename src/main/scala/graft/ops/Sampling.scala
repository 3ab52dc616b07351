package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting — the
  * train/val/test machinery of a training-data pipeline. No RNG state
  * anywhere: membership is a pure function of the row id, so splits are
  * stable across runs, engines, and corpus growth (a document keeps its
  * split forever; new documents distribute uniformly), and any system
  * reading the lakehouse can recompute them.
  */
object Sampling {

  /** Uniform hash bucket in [0, buckets): the first 8 hex chars of
    * md5(id-as-string) read as an unsigned 32-bit int, mod buckets. md5
    * rather than `xxhash64`/`hash`: Spark's hash functions are not
    * portable to other engines, and a split assignment must be
    * reproducible by anything that reads the data (the DuckDB oracle
    * recomputes this expression verbatim). One md5 per row is off the
    * per-pair hot paths, so the cost is irrelevant.
    */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Add a split label column. `splits` are (name, percentage-point)
    * pairs summing to ≤ 100 — e.g. `Seq("train" → 80, "val" → 10,
    * "test" → 10)`; rows whose bucket falls past the last threshold get
    * null (only possible when the weights sum below 100). Narrow
    * codegen'd map: no shuffle, no sampling pass, no driver round-trip.
    */
  def withSplit(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
      outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), s"bad weights: $splits")
    require(splits.map(_._2).sum <= 100, s"weights exceed 100: $splits")
    val bucket = hashBucket(col(idCol), 100)
    val thresholds = splits.zip(splits.scanLeft(0)(_ + _._2).tail)
    val label = thresholds.foldRight(lit(null).cast("string")) {
      case (((name, _), hi), acc) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, label)
  }

  /** Deterministic ~pct% sample: keep rows whose bucket < pct. The same
    * id survives every run — the property that makes downstream caches,
    * eval sets, and A/B slices reproducible.
    */
  def sampleByHash(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct out of range: $pct")
    df.filter(hashBucket(col(idCol), 100) < pct)
  }
}
