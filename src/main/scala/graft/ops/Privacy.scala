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

  /** l-DIVERSITY AUDIT — the attribute-disclosure gate k-anonymity
    * misses: a group can hold ≥ k rows yet give its SENSITIVE attribute
    * away because every member shares one value (the homogeneity
    * attack, Machanavajjhala et al. 2007). Each quasi-identifier group
    * is flagged unless it carries at least `l` DISTINCT sensitive
    * values. Distinct-count per group is the one shuffle and it is
    * partial-aggregable after the inner (quasi..., sensitive) collapse;
    * output is GROUPS, never rows — the same release-gate shape as
    * [[kAnonymityAudit]].
    *
    * @return (quasi cols..., n, n_sensitive, violates)
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 1,
      s"bad audit params: $quasiCols, l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("violates", col("n_sensitive") < l)
  }

  /** t-CLOSENESS AUDIT — the distribution-skew gate completing the
    * k-anonymity / l-diversity ladder: a group can be k-large and
    * l-diverse yet still leak because its SENSITIVE-value distribution
    * sits far from the table's (90% one diagnosis in a group vs 10%
    * globally). Distance is total variation
    * `TVD = ½·Σ_v |p_g(v) − p(v)|` (the categorical instantiation of
    * t-closeness's EMD under unit ground distance); groups with
    * TVD > t flag.
    *
    * Exactness: the numerator is the exact integer
    * `Σ_v |c_gv·n − c_v·n_g|` in DECIMAL(38,0) over the dense
    * group × value grid (absent values contribute `c_v·n_g` — the
    * grid is groups × |sensitive vocab|, vocab-bounded); ONE 6-rounded
    * double division per group at emit, and the t compare runs on the
    * ROUNDED value so both engines decide identically at the boundary.
    *
    * @return (quasi cols..., n, tvd, violates)
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty && t >= 0, s"bad audit params: $quasiCols, t=$t")
    val cells = df.groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = cells.groupBy(quasiCols.map(col): _*).agg(sum("__c").as("__ng"))
    val vals = cells.groupBy(col("__v")).agg(sum("__c").as("__cv"))
    val total = vals.agg(sum("__cv").as("__n"))
    val grid = groups.crossJoin(broadcast(vals)).crossJoin(broadcast(total))
    val joined = grid.join(cells, quasiCols :+ "__v", "left")
      .select((quasiCols.map(col) :+ col("__ng") :+ col("__n") :+
        abs(coalesce(col("__c"), lit(0L)).cast("decimal(38,0)") * col("__n")
          - col("__cv").cast("decimal(38,0)") * col("__ng")).as("__num")): _*)
    joined.groupBy(quasiCols.map(col) :+ col("__ng") :+ col("__n"): _*)
      .agg(sum("__num").as("__numsum"))
      .select((quasiCols.map(col) :+ col("__ng").as("n") :+
        round(col("__numsum").cast("double")
          / (lit(2.0) * col("__ng") * col("__n")), 6).as("tvd")): _*)
      .withColumn("violates", col("tvd") > t)
  }

  /** DP-STYLE NOISY COUNT RELEASE with KEYED (deterministic) Laplace
    * noise: per-group counts released as `n + Lap(sensitivity/ε)`,
    * where the Laplace draw's uniform comes from the 32-bit md5 prefix
    * of `releaseTag || group key` via the inverse CDF — so the same
    * release replays bit-for-bit on any engine, any partitioning, any
    * retry (the repeatable-release discipline: re-running a publication
    * job must not leak a FRESH noise draw for the same statistic —
    * answering the same query twice with independent noise halves the
    * effective ε, so keyed noise is also the better privacy posture for
    * idempotent pipelines).
    *
    * NOT a general DP mechanism: an adversary who can influence the
    * releaseTag/group-key pairing can predict the noise. Treat the tag
    * as a secret per-epoch salt chosen by the releasing party (the
    * standard keyed-PRF instantiation of the Laplace mechanism).
    *
    * Arithmetic contract (cross-engine exact): the uniform is the exact
    * integer `u32` mapped as `u = (u32 + 0.5) / 2³²` (never 0 or ½ —
    * the ln argument `1 − 2|u − ½|` is ≥ 2⁻³² > 0); sign by exact
    * integer compare `u32 ≥ 2³¹`; one double ln + multiply, micro-
    * rounded ONCE into `noise_micro`; the released count re-derives as
    * an integer sum. One partial-aggregable groupBy; noise is a narrow
    * map over the group table.
    *
    * @return (group, n, noise_micro, released) — `released` the noisy
    *         count in exact micro units (LONG), `max(0, ...)` clamped
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      releaseTag: String, sensitivity: Double = 1.0): DataFrame = {
    require(epsilon > 0 && sensitivity > 0,
      s"bad DP params: eps=$epsilon sens=$sensitivity")
    val b = sensitivity / epsilon // Laplace scale
    val counts = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"))
    val u32 = conv(substring(md5(
        concat(lit(releaseTag), lit("|"), col("g").cast("string"))), 1, 8),
      16, 10).cast("long")
    val c = counts.withColumn("__u32", u32)
    val half = lit(2147483648.0) // 2^31
    val absDev = abs(col("__u32").cast("double") + lit(0.5) - half) // |u−½|·2³²
    val lnArg = lit(1.0) - absDev / half // 1 − 2|u − ½|, in (0, 1]
    val sign = when(col("__u32") >= 2147483648L, lit(1.0)).otherwise(lit(-1.0))
    c.withColumn("noise_micro",
        round(sign * lit(-b) * log(lnArg) * lit(1e6), 0).cast("long"))
      .withColumn("released",
        greatest(col("n") * lit(1000000L) + col("noise_micro"), lit(0L)))
      .drop("__u32")
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

  /** Deterministic keyed PSEUDONYMIZATION — replace identifier columns
    * with `md5(salt ‖ ':' ‖ value)` (first 16 hex chars): the
    * ingest-time tokenization that keeps keys JOINABLE (the same value
    * pseudonymizes identically in every table, batch, and engine that
    * holds the salt) while the raw identifier never lands in the
    * lakehouse. The salt is the secret — without it the map is
    * one-way; rotate the salt and every downstream join key rotates
    * with it (the GDPR "crypto-shredding" lever).
    *
    * Token width vs collision risk (birthday bound, any-collision
    * probability ≈ n²/2·2^bits): the full 128-bit md5 default keeps it
    * below 1.5·10⁻²¹ at a BILLION distinct subjects. A 16-hex (64-bit)
    * token — `hexChars = 16`, the narrow opt-in where token bytes are
    * storage-sensitive — is below 3·10⁻⁸ only up to ~a MILLION
    * subjects; at 10⁹ it reaches ~2.7%, and a collision silently
    * merges two subjects' records under one pseudonym, so do not opt
    * down at population scale.
    *
    * Scale shape: a narrow codegen'd projection — no shuffle, no
    * lookup table to build, distribute, or leak (the failure mode of
    * mapping-table tokenization at 100 TB).
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String,
      hexChars: Int = 32): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: no columns given")
    require(salt.nonEmpty, "pseudonymize: empty salt defeats the point")
    require(hexChars >= 16 && hexChars <= 32,
      s"pseudonymize: hexChars must be in [16, 32], got $hexChars " +
        "(below 64 bits the birthday bound bites at sub-million scale)")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, when(col(c).isNull, lit(null).cast("string"))
        .otherwise(substring(md5(concat(lit(salt), lit(":"),
          col(c).cast("string")).cast("binary")), 1, hexChars)))
    }
  }
}
