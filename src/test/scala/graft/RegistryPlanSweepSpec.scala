package graft

/** REGISTRY-WIDE plan-shape sweep: execute EVERY `SparkEntry.queries`
  * entry at sf0.001 and assert the 100 TB-viability invariants on each
  * adapted plan — no `CartesianProduct` anywhere, no
  * `BroadcastNestedLoopJoin` outside a per-query whitelist of
  * deliberately-bounded broadcast sides, and no `ScalaUDF` outside the
  * two deliberate §2.6 surface sites. PlanAuditSpec asserts rich,
  * hand-picked properties on ~15 queries; this sweep is the dragnet
  * that catches a regression in any of the other ~280 — without it, a
  * lost broadcast or an accidental cross join surfaces only as bench
  * drift a round later.
  *
  * Whitelist contract: every BNLJ entry names WHY its broadcast side is
  * bounded (a 1-row gate aggregate, a ≤k-row sketch/centroid frame, a
  * group-scale stats table). A new query that introduces a BNLJ must
  * either restructure or add itself here with a reason — silence is not
  * an option.
  *
  * Runtime: ~4.5 min for the full registry at sf0.001 (measured 257 s
  * over 290 queries, max 9.5 s) — the price of executing real plans;
  * pattern-matching unexecuted plans would miss everything AQE decides.
  */
class RegistryPlanSweepSpec extends SparkSpec {

  /** Queries whose adapted plan legitimately contains a
    * BroadcastNestedLoopJoin — each with the bounded-broadcast-side
    * reason. A BNLJ is only a scale hazard when the broadcast side can
    * grow with the data; every side below is constant- or k-bounded by
    * construction.
    */
  private val bnljAllowed: Map[String, String] = Map(
    // gate plumbing: crossJoin of 1-row aggregates (totals, thresholds,
    // norms) against 1-row or group-scale frames — literal-bounded
    "q59_incremental_quantiles" -> "1-row merged-sketch frames crossed for the merge-law gate",
    "q74_dd_by_type" -> "1-row DDSketch merge-law gate frames",
    "q79_stream_dd" -> "1-row stream-vs-batch sketch compare",
    "q87_acf" -> "1-row series mean/variance normalizer",
    "q88_stream_kmv" -> "1-row KMV estimate vs truth compare",
    "t29_kl_drift" -> "1-row corpus token totals normalizing the per-term frame",
    "t45_skew_profile" -> "1-row corpus aggregate against the per-key profile",
    "t62_ks_drift" -> "1-row per-corpus counts for the CDF normalizer",
    "t65_lift_table" -> "1-row corpus total under the lift denominator",
    "t72_t_closeness" -> "1-row global value distribution vs per-class frames",
    "t75_ams_f2" -> "≤sketch-width AMS counter frames crossed for the merge law",
    "t78_kmv_intersect" -> "≤k-row KMV sketch frames (theta intersect + gates)",
    "sim14_quant_audit" -> "1-row recall/distortion gate aggregates",
    "sim26_embed_drift" -> "1-row per-window centroid/variance frames",
    "t82_refinery" -> "1-row stage-count audit aggregates",
    "io25_rg_bloom" -> "1-row row-group audit totals",
    "io26_mor_delete" -> "1-row pre/post delete totals for the gate",
    "io29_rename_evolution" -> "1-row pre/post rename totals for the gate",
    "g9_modularity" -> "1-row graph totals (2m, degree sums) under the modularity sum",
    "d6_ivf_dup" -> "1-row threshold aggregate gating the cell-blocked pair scan",
    // small-frame normalizers: corpus × broadcast(≤vocab/group-scale stats)
    "t5_tfidf" -> "1-row doc-count frame under the idf term",
    "t13_mixing" -> "per-source weight table (constant row count)",
    "t14_surprisal" -> "1-row corpus token total under the unigram LM",
    "t16_pmi" -> "1-row totals normalizing the pair/unigram frames",
    "t17_temperature" -> "1-row budget + per-source share frames (constant rows)",
    "t23_bigram_surprisal" -> "1-row corpus totals under the bigram LM",
    "t40_df_prune" -> "1-row doc-count frame for the df thresholds",
    "t51_bm25" -> "1-row corpus avgdl/N frame under the BM25 weights",
    "t54_dsir" -> "1-row source token totals for the importance weights",
    "t60_kn_surprisal" -> "1-row discount/continuation totals of the KN LM",
    "t76_pps_sample" -> "1-row weight-sum frame for inclusion probabilities",
    "t79_tfidf_topk" -> "1-row doc-count frame under the idf term",
    "io15_bucketed_bm25" -> "1-row corpus stats frame (bucketed artifact reuse)",
    // ANN / retrieval: bounded centroid tables or bounded query sets
    "sim1_topk" -> "brute-force oracle: bounded query set broadcast over the corpus",
    "sim2_ivf_topk" -> "k-row centroid table scored per vector (the IVF assign step)",
    "sim6_text_ann" -> "k-row centroid table for hashed-embedding assignment",
    "sim8_trained_ivf" -> "k-row trained-centroid table in the assign step",
    "sim13_ivfadc" -> "k-row coarse + 2^nbits sub-codebook tables (both k-bounded)",
    "sim16_hybrid" -> "1-row corpus stats + bounded query set in the fusion",
    "sim17_ndcg" -> "bounded query/ideal frames in the metric join",
    "sim20_hard_negatives" -> "bounded anchor set against the scored pool",
    // basket analysis: broadcast frequent-item sets (support-pruned,
    // ≤ frequent-item count by construction)
    "q72_basket_pairs" -> "broadcast frequent-1-item set pruning pair candidates",
    "q73_basket_triples" -> "broadcast frequent-1/2-item sets pruning triple candidates"
  )

  /** The ONLY sanctioned ScalaUDF sites: the reference-parity scalar
    * UDF surface (SURVEY §2.6) kept deliberately next to the native
    * Catalyst expression it was promoted to.
    */
  private val udfAllowed: Map[String, String] = Map(
    "io5_pipeline_e2e" -> "E2 skills-extraction UDF v0 — §2.6 scalar-UDF parity surface",
    "p5_full_pipeline" -> "E2 skills-extraction UDF v0 — §2.6 scalar-UDF parity surface"
  )

  test("every registry query at sf0.001: no CartesianProduct, no " +
      "unwhitelisted BroadcastNestedLoopJoin, no unwhitelisted ScalaUDF") {
    val violations = scala.collection.mutable.ListBuffer[String]()
    var ran = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        // ScalaUDF hides inside analyzed-plan expressions (the executed
        // plan renders it opaquely) — walk the expressions directly
        val udfs = df.queryExecution.analyzed.collect {
          case p => p.expressions.flatMap(_.collect {
            case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
              u.udfName.getOrElse("anon")
          })
        }.flatten.distinct
        df.collect() // finalize AQE — assertions run on the ADAPTED plan
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        def countOf(op: String) = plan.sliding(op.length).count(_ == op)
        if (countOf("CartesianProduct") > 0)
          violations += s"$name: CartesianProduct in adapted plan"
        val bnlj = countOf("BroadcastNestedLoopJoin")
        if (bnlj > 0 && !bnljAllowed.contains(name))
          violations += s"$name: $bnlj unwhitelisted BroadcastNestedLoopJoin" +
            " — restructure to an equi-join/broadcast-hash, or whitelist" +
            " with the bounded-side reason"
        if (udfs.nonEmpty && !udfAllowed.contains(name))
          violations += s"$name: unwhitelisted ScalaUDF " +
            s"[${udfs.mkString(",")}] — promote to a native expression"
        ran += 1
      } catch {
        case e: Throwable =>
          violations += s"$name: THREW ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(200)
      }
    }
    assert(violations.isEmpty,
      s"plan-shape sweep: ${violations.size} violation(s) " +
        s"after $ran clean queries:\n${violations.mkString("\n")}")
    assert(ran == SparkEntry.queries.size)
  }

  test("shared corpus artifacts memoize per (session, dir) — a memo-key " +
      "regression would silently rebuild the corpus shuffle everywhere") {
    assert(SparkEntry.sharedTf(spark, sf0001) eq
      SparkEntry.sharedTf(spark, sf0001))
    assert(SparkEntry.sharedWords(spark, sf0001) eq
      SparkEntry.sharedWords(spark, sf0001))
    // distinct dirs are distinct artifacts
    assert(!(SparkEntry.sharedTf(spark, sf0001) eq
      SparkEntry.sharedTf(spark, "/root/testdata/sf0.01")))
  }

  test("shared corpus artifacts EVICT on dir change: the superseded " +
      "dir's checkpoint blocks unpersist instead of pinning for the " +
      "session's lifetime") {
    val sc = spark.sparkContext
    def rddIdOf(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
        case p => fail(s"expected a checkpointed LogicalRDD leaf, got " +
          s"${p.getClass.getSimpleName}")
      }
    val a = SparkEntry.sharedTf(spark, sf0001)
    val aId = rddIdOf(a)
    assert(sc.getPersistentRDDs.contains(aId),
      "a fresh shared artifact must be persisted")
    // dir change for the same kind: the stale entry must unpersist NOW
    // (map removal alone would leave freeing to GC + ContextCleaner)
    val b = SparkEntry.sharedTf(spark, "/root/testdata/sf0.01")
    assert(!sc.getPersistentRDDs.contains(aId),
      "superseded artifact's checkpoint blocks still persisted")
    assert(sc.getPersistentRDDs.contains(rddIdOf(b)))
    // same-dir call is still the memo hit
    assert(SparkEntry.sharedTf(spark, "/root/testdata/sf0.01") eq b)
    // and the evicted dir rebuilds cleanly on demand
    assert(SparkEntry.sharedTf(spark, sf0001).count() > 0)
  }
}
