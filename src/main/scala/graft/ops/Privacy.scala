package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / data-governance primitives — the release-gate side of a
  * corpus pipeline: before a table (or a training extract) leaves the
  * boundary, the quasi-identifier combinations that single people out
  * must be found and coarsened. Deterministic by construction (no noise
  * injection — DP mechanisms need calibrated randomness and live
  * upstream of the gate), so every audit replays bit-for-bit across
  * engines.
  */
object Privacy {

  /** k-ANONYMITY AUDIT: group the frame by its quasi-identifier columns
    * and flag every group smaller than `k` — each is a set of rows an
    * attacker can narrow to fewer than `k` candidates. One
    * partial-aggregable groupBy; output is GROUPS (quasi-identifier
    * cardinality), never rows.
    *
    * @return (quasi cols..., n, violates)
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1, s"bad audit params: $quasiCols, k=$k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("violates", col("n") < k)
  }

  /** GENERALIZATION LADDER to k-anonymity: evaluate a caller-supplied
    * sequence of generalization levels (finest first — e.g. exact
    * balance bucket → coarse bucket → dropped), each level a set of
    * named quasi-identifier expressions, and report per level the group
    * count, violating-group count, and minimum group size, with the
    * FIRST fully-k-anonymous level marked `chosen`. The standard
    * minimum-generalization release decision, made auditable: the
    * output shows exactly how much resolution had to be sacrificed and
    * that no finer level sufficed.
    *
    * Scale shape: one partial-aggregable groupBy + a 1-row rollup per
    * level — levels are few and fixed; nothing touches row payloads.
    * The level audits union into one frame, so the whole decision is a
    * single plan.
    *
    * @param levels (levelName, quasi expressions (name → Column)) in
    *        finest-to-coarsest order
    * @return one row per level: (level, level_name, n_groups,
    *         n_violating, min_group, chosen)
    */
  def generalizeUntilK(df: DataFrame, levels: Seq[(String, Seq[(String, Column)])],
      k: Long): DataFrame = {
    require(levels.nonEmpty && k >= 1, s"bad ladder params: ${levels.size}, k=$k")
    val perLevel = levels.zipWithIndex.map { case ((name, quasi), i) =>
      df.select(quasi.map { case (n, c) => c.as(n) }: _*)
        .groupBy(quasi.map { case (n, _) => col(n) }: _*)
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating"),
          min(col("n")).as("min_group"))
        .select(lit(i.toLong).as("level"), lit(name).as("level_name"),
          col("n_groups"), col("n_violating"), col("min_group"))
    }.reduce(_ unionByName _)
    // chosen = the first level with zero violations; window over the
    // LEVELS frame (a handful of rows), not data
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("level")
      .rowsBetween(Window.unboundedPreceding, -1)
    perLevel
      .withColumn("__ok", col("n_violating") === 0L)
      .withColumn("__prior_ok", coalesce(
        max(col("__ok").cast("int")).over(w), lit(0)))
      .withColumn("chosen", col("__ok") && col("__prior_ok") === 0)
      .drop("__ok", "__prior_ok")
  }
}
