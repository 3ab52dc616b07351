package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining (a-priori): which items appear
  * TOGETHER in the same basket more often than a support floor — the
  * affinity primitive behind "frequently bought together", skill
  * co-occurrence maps, and co-citation graphs.
  *
  * Scale posture (100 TB of baskets): the within-basket self-join is
  * inherently quadratic PER BASKET, so everything hinges on shrinking
  * the item domain before it runs. A-priori monotonicity (an itemset's
  * support ≤ every subset's support) makes that pruning LOSSLESS:
  *   1. one pass counts item supports (groupBy — map-side combinable);
  *   2. baskets are semi-joined down to frequent items only;
  *   3. only then does the per-basket pair join run — and for triples,
  *      only extensions of already-frequent PAIRS are ever counted.
  * Every join keys on the basket id, so the pruned item table reuses
  * one hash partitioning; the frequent-item and frequent-pair lists are
  * support-thresholded (small by construction) and broadcast. The
  * support floor itself rides IN-PLAN as a broadcast 1-row stats frame
  * (n_baskets, ms) — no driver-side count action, one job end-to-end,
  * and the basket-distinct exchange is planned once and reused by every
  * consumer (self-join sides included). No cartesian products beyond
  * the 1-row broadcast, nothing collected to the driver.
  */
object Baskets {

  /** Distinct (basket, item) pairs — multiplicity inside a basket never
    * counts twice toward support (the standard market-basket contract).
    */
  private def distinctItems(df: DataFrame, basketCol: String,
      itemCol: String): DataFrame =
    df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("item").isNotNull).distinct()

  /** 1-row (n_baskets, ms) frame; `msOf` may reference `n_baskets` —
    * that is how the RELATIVE floor stays inside the plan.
    */
  private def stats(items: DataFrame, msOf: Column): DataFrame =
    items.agg(countDistinct(col("basket")).as("n_baskets"))
      .withColumn("ms", msOf)

  private def pairsCore(items: DataFrame, msOf: Column): DataFrame = {
    val st = stats(items, msOf)
    val freq = items.groupBy("item").agg(count(lit(1)).as("supp"))
      .crossJoin(broadcast(st)).filter(col("supp") >= col("ms"))
      .select("item", "supp")
    // lossless prune: a pair of a non-frequent item can't be frequent
    val pruned = items.join(broadcast(freq.select("item")), Seq("item"), "leftsemi")
    pruned.select(col("basket"), col("item").as("item_a"))
      .join(pruned.select(col("basket"), col("item").as("item_b")), Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(st)).filter(col("support") >= col("ms"))
      .join(broadcast(freq.select(col("item").as("item_a"), col("supp").as("supp_a"))), Seq("item_a"))
      .join(broadcast(freq.select(col("item").as("item_b"), col("supp").as("supp_b"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("support"),
        col("supp_a"), col("supp_b"),
        expr("(support * n_baskets * 1000000L) div (supp_a * supp_b)")
          .as("lift_micro"))
  }

  /** Frequent item PAIRS with supports and integer-micro lift.
    *
    * `lift = support(a,b) · n_baskets / (support(a) · support(b))` —
    * > 1 means the pair co-occurs beyond independence. Reported in
    * exact micros (`⌊·1e6⌋`, all terms positive LONGs) so every engine
    * lands the same integer; the LONG numerator is exact to
    * n_baskets ≈ 3·10⁹ — per-day partitions at corpus scale; beyond
    * that the same expression moves to DECIMAL(38,0).
    *
    * @return (item_a, item_b, support, supp_a, supp_b, lift_micro),
    *         item_a < item_b, both items and the pair ≥ `minSupport`.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    pairsCore(distinctItems(df, basketCol, itemCol), lit(minSupport))
  }

  /** [[frequentPairs]] with a RELATIVE support floor
    * `max(floorAbs, n_baskets / denom)` computed in-plan — the form a
    * recurring pipeline wants, since "support 300" means nothing across
    * days of different sizes while "0.2% of baskets" does.
    */
  def frequentPairsRelative(df: DataFrame, basketCol: String,
      itemCol: String, floorAbs: Long, denom: Long): DataFrame = {
    require(floorAbs >= 1 && denom >= 1, s"bad floor $floorAbs/$denom")
    pairsCore(distinctItems(df, basketCol, itemCol),
      greatest(lit(floorAbs), expr(s"n_baskets div $denom")))
  }

  private def triplesCore(items: DataFrame, msOf: Column): DataFrame = {
    val st = stats(items, msOf)
    val freq = items.groupBy("item").agg(count(lit(1)).as("supp"))
      .crossJoin(broadcast(st)).filter(col("supp") >= col("ms"))
      .select("item")
    val pruned = items.join(broadcast(freq), Seq("item"), "leftsemi")
    val freqPairs = pairsCore(items, msOf).select("item_a", "item_b")
    val pairInst = pruned.select(col("basket"), col("item").as("item_a"))
      .join(pruned.select(col("basket"), col("item").as("item_b")), Seq("basket"))
      .filter(col("item_a") < col("item_b"))
      .join(broadcast(freqPairs), Seq("item_a", "item_b"), "leftsemi")
    pairInst
      .join(pruned.select(col("basket"), col("item").as("item_c")), Seq("basket"))
      .filter(col("item_c") > col("item_b"))
      .groupBy("item_a", "item_b", "item_c")
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(st)).filter(col("support") >= col("ms"))
      .select("item_a", "item_b", "item_c", "support")
  }

  /** Frequent item TRIPLES. A-priori level 3: pair instances are
    * materialized only for pairs already known frequent (broadcast
    * semi-join against [[frequentPairs]]' output), then extended by a
    * third in-basket item `> item_b`. The final `≥ minSupport` filter
    * subsumes the textbook all-subpairs-frequent candidate check
    * (monotonicity) — the pruning here is a cost lever, not a
    * correctness step, so a plain 3-way self-join oracle agrees.
    *
    * @return (item_a, item_b, item_c, support), a < b < c.
    */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    triplesCore(distinctItems(df, basketCol, itemCol), lit(minSupport))
  }

  /** [[frequentTriples]] with the in-plan relative floor of
    * [[frequentPairsRelative]].
    */
  def frequentTriplesRelative(df: DataFrame, basketCol: String,
      itemCol: String, floorAbs: Long, denom: Long): DataFrame = {
    require(floorAbs >= 1 && denom >= 1, s"bad floor $floorAbs/$denom")
    triplesCore(distinctItems(df, basketCol, itemCol),
      greatest(lit(floorAbs), expr(s"n_baskets div $denom")))
  }
}
