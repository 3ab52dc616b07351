package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Plan-shape audits: the properties that keep queries viable at 100 TB,
  * asserted on the actual executed plans so a refactor that silently loses
  * pushdown / pruning / broadcast / partial aggregation fails CI — not a
  * cluster run three weeks later.
  *
  * Assertions match the rendered plan text: after AQE adaptation the
  * operator tree is split into `QueryStageExec` nodes, which are LEAVES to
  * `plan.collect` — a structural match would see none of the joins inside
  * the stages. The printed form shows the whole adapted tree.
  */
class PlanAuditSpec extends SparkSpec {

  private def executed(df: DataFrame): String = {
    df.collect()
    // keep only the adapted plan: the rendered AdaptiveSparkPlan repeats
    // every node under "== Initial Plan ==", which would double-count
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def countOf(plan: String, needle: String): Int =
    plan.sliding(needle.length).count(_ == needle)

  test("parquet filter pushdown + column pruning reach the scan") {
    val q = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = executed(q).linesIterator
      .find(_.contains("FileScan parquet")).getOrElse(fail("no parquet scan"))
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"filter not pushed: $scan")
    // pruned read schema: exactly the two referenced columns
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned: $scan")
  }

  test("q3 dimension chain joins are all broadcast, fact side never shuffles for the joins") {
    val plan = executed(SparkEntry.queries("q3_nation_revenue")(spark, sf0001))
    assert(countOf(plan, "BroadcastHashJoin") == 3,
      s"expected 3 broadcast joins:\n$plan")
    // the only exchanges are the post-join aggregation + final ordering —
    // the orders fact table reaches its first join without a shuffle
    val shuffles = countOf(plan, "Exchange hashpartitioning") +
      countOf(plan, "Exchange rangepartitioning")
    assert(shuffles <= 2, s"unexpected shuffles ($shuffles):\n$plan")
  }

  test("groupBy aggregates partially before the shuffle (map-side combine)") {
    val plan = executed(
      Tables.lineitem(spark, sf0001).groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q")))
    assert(plan.contains("partial_sum"), s"no partial aggregate:\n$plan")
    // exactly one shuffle, carrying the compacted partial rows
    assert(countOf(plan, "Exchange hashpartitioning") == 1, s"plan:\n$plan")
  }

  test("partition pruning: reading one lang partition scans one directory") {
    val path = "/tmp/graft_plan_audit_parts"
    Tables.documents(spark, sf0001).select("doc_id", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(path)
    val q = spark.read.parquet(path).filter(col("lang") === "de")
    val scanLine = executed(q).linesIterator
      .find(_.contains("FileScan parquet")).getOrElse(fail("no parquet scan"))
    assert(scanLine.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition filter: $scanLine")
  }

  test("limit+order composes to TakeOrderedAndProject (no global sort)") {
    val q = Tables.orders(spark, sf0001)
      .orderBy(desc("o_totalprice")).limit(5)
    assert(executed(q).contains("TakeOrderedAndProject"),
      "top-k should not run a full sort")
  }

  test("d5 exact similarity join runs blocked — equi-join on the grid key, no nested loop") {
    val plan = executed(SparkEntry.queries("d5_embedding_dup")(spark, sf0001))
    // the block grid turns all-pairs into an equi-join on (bi, bj); whether
    // the physical join broadcasts or shuffles is Catalyst's size-based
    // call (broadcast IS right at this sf, shuffle at 100 TB) — what must
    // never appear is a nested-loop / cartesian pairing of the corpus
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs nested loop in d5 plan:\n$plan")
    assert(plan.contains("Join [bi") || plan.contains("HashJoin [bi") ||
      plan.contains("SortMergeJoin [bi"),
      s"pairing join not keyed on the block grid:\n$plan")
  }

  test("d4 simhash pairing is an equi-join on segment keys, not a nested loop") {
    val plan = executed(SparkEntry.queries("d4_simhash")(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs nested loop in d4 plan:\n$plan")
  }

  test("d16 bloom prefilter probes with the native might_contain expression, no ScalaUDF") {
    // the probe must be the codegen'd BloomFilterMightContain over the
    // serialized-filter literal — a ScalaUDF here would force the fresh
    // batch's probing projection out of whole-stage codegen
    val plan = executed(SparkEntry.queries("d16_incremental_bloom")(spark, sf0001))
    assert(plan.contains("might_contain"),
      s"native bloom probe missing from d16 plan:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"UDF leaked into the d16 probe path:\n$plan")
  }

  test("runtime bloom-filter join pruning injects on a selective shuffle join") {
    // semi-join reduction: the big side is pre-filtered by a bloom filter
    // built from the selective side, cutting shuffled bytes before the
    // join — the knob a 100 TB fact⋈selective-dim join turns on. Local
    // thresholds are sized down to let the tiny test corpus qualify.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, sf0001)
      val o = Tables.orders(spark, sf0001).filter(col("o_orderpriority") === "1-URGENT")
      val plan = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter in plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("IVF corpus cell assignment is a partial-aggregable argmin, not a window sort") {
    // keep=1 nearest-centroid assignment must collapse the n×ncells scored
    // rows map-side (partial_min before the shuffle) instead of shuffling
    // and sorting them all under a Window — the difference between moving
    // n rows and n×ncells rows at 100 TB. The probe side (keep=nprobe>1)
    // legitimately keeps a window; this locks the corpus side's shape.
    val plan = executed(SparkEntry.queries("sim2_ivf_topk")(spark, sf0001))
    assert(plan.contains("partial_min"),
      s"sim2 corpus assignment lost the partial-aggregable argmin:\n$plan")
  }

  test("sim18 label-partitioned filtered ANN: centroids broadcast, own-label " +
      "assignment partial-aggregable, candidate join an equi-join") {
    // the r12 rebuild's scale contract: the per-label centroid table is
    // ONE broadcast (n/centroidEvery + |labels| rows), the corpus side's
    // own-label argmin collapses map-side (partial_min), and the
    // candidate pairing is a hash equi-join on (cent_id, label) — never
    // a cartesian/nested loop over corpus x queries
    val plan = executed(SparkEntry.queries("sim18_filtered_ann")(spark, sf0001))
    assert(plan.contains("partial_min"),
      s"sim18 own-label assignment lost the partial-aggregable argmin:\n$plan")
    assert(countOf(plan, "BroadcastExchange") >= 1,
      s"sim18 centroid table not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"sim18 candidate pairing degenerated to a cartesian product:\n$plan")
  }

  test("t13 mixing joins the corpus against broadcast rates — corpus side unshuffled") {
    // the rate table is |groups| rows; the corpus must meet it via a
    // broadcast hash join (a shuffled join would move the corpus for a
    // five-row dimension). The tiny SinglePartition exchange on the
    // counts frame (global min) is by design.
    val plan = executed(SparkEntry.queries("t13_mixing")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"mixing corpus join is not broadcast:\n$plan")
  }

  test("t14/t16 corpus-side unigram joins are broadcast (Zipf mega-keys never shuffle)") {
    // the exploded corpus joins the vocab on raw token — a shuffled join
    // would hash-partition every occurrence of "the" onto one task. The
    // vocab side carries an explicit broadcast() hint; lock that every
    // token-keyed join in both plans is a BroadcastHashJoin (the t16
    // bigram→unigram joins count twice) and that no sort-merge join
    // sneaks in anywhere.
    for ((q, minBhj) <- Seq("t14_surprisal" -> 1, "t16_pmi" -> 2)) {
      val plan = executed(SparkEntry.queries(q)(spark, sf0001))
      assert(countOf(plan, "BroadcastHashJoin") >= minBhj,
        s"$q unigram join(s) not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q fell back to a shuffled token join:\n$plan")
    }
  }

  test("m6 text embedding is a pure narrow map — no shuffle, no fallback eval") {
    // the embedder must stay a per-row projection (hashed_embed is a
    // native expression): any Exchange here means the featurizer grew a
    // wide edge, and BatchEvalPython/CodegenFallback would mean the hot
    // kernel left compiled code
    val plan = executed(SparkEntry.queries("m6_embed_real")(spark, sf0001))
    assert(countOf(plan, "Exchange hashpartitioning") == 0,
      s"embedding projection shuffles:\n$plan")
    assert(!plan.contains("BatchEvalPython"), "embedder must stay native")
  }

  test("d14 substring anchor pairing is an equi-join on the anchor hash, no nested loop") {
    val plan = executed(SparkEntry.queries("d14_substring_spans")(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop pairing in d14 plan:\n$plan")
  }

  test("t18 gradient aggregate is partial before the shuffle") {
    // the classifier's per-iteration gradient must combine map-side —
    // at 100 TB the shuffle carries dim-sized partials, not the corpus
    val d = Tables.documents(spark, sf0001)
      .withColumn("__y", (col("lang") === "en").cast("int"))
    graft.expr.VecExpressions.register(spark)
    import org.apache.spark.sql.functions._
    val base = d.select((col("__y").cast("double") * 1e6).cast("long").as("ym"),
      transform(call_function("hashed_embed", col("text"), lit(16)),
        x => round(x.cast("double") * 1e6, 0).cast("long")).as("xm"))
    val grad = base.select(col("ym").as("r"), posexplode(col("xm")).as(Seq("j", "x")))
      .groupBy("j").agg(sum((col("r") * col("x")).cast("decimal(38,0)")).as("s"))
    val plan = executed(grad)
    assert(plan.contains("partial_sum"), s"no map-side gradient combine:\n$plan")
  }

  test("t19 profiler computes all multi-distincts in ONE scan via Expand") {
    val plan = executed(SparkEntry.queries("t19_profile")(spark, sf0001))
    assert(plan.contains("Expand"), s"multi-distinct lost its Expand plan:\n$plan")
    assert(countOf(plan, "FileScan parquet") == 1,
      s"profiler re-scans the table per column:\n$plan")
  }

  test("io8 z-order rewrite is a single range repartition (no extra shuffles)") {
    val plan = executed(SparkEntry.queries("io8_zorder")(spark, sf0001))
    assert(plan.contains("rangepartitioning"),
      s"clusterByZ lost its range partitioning:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLAppStatusStore UDF"),
      "zValue must stay native")
  }

  test("d10 incremental band join pairs fresh x history by equi-key, no nested loop") {
    val plan = executed(SparkEntry.queries("d10_incremental_minhash")(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop pairing in d10 plan:\n$plan")
  }

  test("window top-k filters get WindowGroupLimit (partial per-partition top-k)") {
    // Spark's InferWindowGroupLimit turns `row_number().over(w) <= k`
    // into a pre-window partial top-k on each input partition, bounding
    // what the window sort sees — the difference between sorting k rows
    // per group per partition and sorting the whole group at 100 TB.
    // Lock it on the queries that rely on the shape.
    for (q <- Seq("q7_window_topk", "t5_tfidf", "t10_rebalance")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf0001))
      assert(plan.contains("WindowGroupLimit"), s"$q lost WindowGroupLimit:\n$plan")
    }
  }

  test("g1 pagerank rounds: partial LONG sums, scalar N broadcast, no cartesian blowup") {
    // the gated query localCheckpoints each round (its executed plan is a
    // checkpoint scan); lock the ROUND plan by disabling truncation
    val shard = col("doc_id") % 500
    val edges = Tables.documents(spark, sf0001)
      .select(shard.as("src"), ((shard * 31 + 7) % 500).as("dst"))
      .distinct()
    val df = graft.ops.Graph.pageRank(edges, "src", "dst",
      iters = 2, checkpointEvery = Int.MaxValue)
    df.collect()
    // contains-style asserts want the UNtruncated render: the persisted
    // inner frames nest their own "== Initial Plan ==" markers, and
    // executed()'s split would cut the outer plan at the first one
    val plan = df.queryExecution.executedPlan.toString
    // the inflow aggregation must combine map-side every round
    assert(plan.contains("partial_sum"), s"inflow sum not partial:\n$plan")
    // the only nested-loop joins are the broadcast 1-row N frame
    assert(!plan.contains("CartesianProduct"), s"cartesian in pagerank:\n$plan")
  }

  test("partitioned read: the partition-key predicate prunes at planning, not post-scan") {
    val path = java.nio.file.Files.createTempDirectory("graft-ppr").toString + "/docs"
    Tables.documents(spark, sf0001).select("doc_id", "lang", "source")
      .write.mode("overwrite").partitionBy("lang").parquet(path)
    val df = spark.read.parquet(path).filter(col("lang") === "de")
      .groupBy("source").agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the predicate must reach the scan's PartitionFilters — directory
    // pruning at listing time, zero bytes read from other languages
    assert(plan.contains("PartitionFilters") && plan.contains("(lang"),
      s"lang predicate did not become a partition filter:\n$plan")
    // and must NOT survive as a post-scan row filter (that would mean
    // every partition was read and rows discarded after IO)
    assert(!plan.split("PartitionFilters")(0).contains("Filter ("),
      s"row-level filter still present above the pruned scan:\n$plan")
  }

  test("g6 personalized pagerank rounds: partial sums, seed literal never joins") {
    val shard = col("doc_id") % 500
    val edges = Tables.documents(spark, sf0001)
      .select(shard.as("src"), ((shard * 31 + 7) % 500).as("dst"))
      .distinct()
    val df = graft.ops.Graph.personalizedPageRank(edges, "src", "dst",
      Seq(0L, 1L, 2L), iters = 2, checkpointEvery = Int.MaxValue)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), s"inflow sum not partial:\n$plan")
    // seeds are an isin LITERAL — no join, no broadcast frame, and
    // (unlike g1) no 1-row N cross join anywhere in the round plan
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"seed handling introduced a degenerate join:\n$plan")
  }

  test("t45 skew profile: per-key count is partial; rank is the documented 2-window bound") {
    val plan = executed(SparkEntry.queries("t45_skew_profile")(spark, sf0001))
    assert(plan.contains("partial_count"), s"key counts not partial:\n$plan")
    // one global rank window per profiled key (the vocab-bounded
    // single-task sort the scaladoc documents) and exactly the two
    // 1-row null-count cross joins — nothing else nested-loops
    assert(countOf(plan, "Window") == 2, s"unexpected window count:\n$plan")
    assert(countOf(plan, "BroadcastNestedLoopJoin") == 2 &&
      !plan.contains("CartesianProduct"), s"degenerate join:\n$plan")
  }

  test("t46 AUC: score table partial-aggregated, one rank window, label join broadcast") {
    val plan = executed(SparkEntry.queries("t46_classifier_auc")(spark, sf0001))
    assert(plan.contains("partial_count"), s"score groupBy not partial:\n$plan")
    assert(countOf(plan, "Window") == 1, s"unexpected window count:\n$plan")
    assert(countOf(plan, "BroadcastHashJoin") == 1 &&
      countOf(plan, "SortMergeJoin") == 0, s"label join regressed:\n$plan")
  }

  test("t47 calibration is one agg shuffle + presentation sort, zero joins") {
    val plan = executed(SparkEntry.queries("t47_calibration")(spark, sf0001))
    assert(countOf(plan, "Exchange") == 2, s"extra shuffles:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"calibration must stay join/window-free:\n$plan")
    assert(plan.contains("partial_count"), s"bin agg not partial:\n$plan")
  }

  test("q27 CDC merge is one reduction window + one key join, change side reduced first") {
    val plan = executed(SparkEntry.queries("q27_cdc_merge")(spark, sf0001))
    assert(plan.contains("FullOuter"), s"merge lost its full-outer join:\n$plan")
    assert(countOf(plan, "RunningWindowFunction") + countOf(plan, "Window") >= 1,
      s"latest-wins window missing:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in CDC merge:\n$plan")
  }

  test("d17 edit-distance pairing is an equi-join on the prefix block, never nested-loop") {
    val plan = executed(SparkEntry.queries("d17_edit_distance")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop pairing in d17:\n$plan")
  }

  test("t21 CMS probe joins the broadcast sketch; top-k is TakeOrderedAndProject") {
    val plan = executed(SparkEntry.queries("t21_cms_topk")(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"heavy-hitter top-k became a global sort:\n$plan")
    assert(countOf(plan, "BroadcastHashJoin") >= 1,
      s"sketch probe not broadcast:\n$plan")
  }

  test("t22 HLL register build is a partial-aggregable max (mergeable sketch shape)") {
    val plan = executed(SparkEntry.queries("t22_hll_distinct")(spark, sf0001))
    assert(plan.contains("partial_max"), s"register max not partial:\n$plan")
  }

  test("t23 bigram scoring joins are broadcast — the exploded corpus never shuffles on tokens") {
    val plan = executed(SparkEntry.queries("t23_bigram_surprisal")(spark, sf0001))
    // unigram c_a, unigram c_b, scalar N, and the per-position scoring join
    assert(countOf(plan, "BroadcastHashJoin") >= 3,
      s"expected broadcast vocab/scored joins:\n$plan")
  }

  test("q28 funnel: equi-joins on the user key only, partial-aggregable step mins") {
    val plan = executed(SparkEntry.queries("q28_funnel")(spark, sf0001))
    assert(plan.contains("partial_min"), s"step mins not partial:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ts-bound turned a funnel join non-equi:\n$plan")
  }

  test("sim9 PQ: codebook broadcast, argmin is a partial-aggregable groupBy") {
    val plan = executed(SparkEntry.queries("sim9_pq_codes")(spark, sf0001))
    assert(countOf(plan, "BroadcastHashJoin") >= 1, s"codebook not broadcast:\n$plan")
    assert(plan.contains("partial_min"), s"PQ argmin not partial:\n$plan")
    assert(!plan.contains("Window"), s"PQ argmin fell back to a window sort:\n$plan")
  }

  test("sim12 PQ re-rank: shortlist and queries broadcast, corpus never shuffles") {
    val plan = executed(SparkEntry.queries("sim12_pq_rerank")(spark, sf0001))
    // exactly five broadcast joins (probed via PlanProbe): the coding
    // pass's codebook join, the query×codebook distance-table build, the
    // codes⋈distance-table probe, the corpus⋈shortlist re-rank fetch,
    // and the final ⋈queries — an exact count so no join can silently
    // regress to another strategy
    assert(countOf(plan, "BroadcastHashJoin") == 5,
      s"re-rank probe not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"re-rank degenerated to a nested loop:\n$plan")
    // the only sort-bearing window is over |queries|·shortlist rows
    assert(countOf(plan, "SortMergeJoin") == 0,
      s"corpus side shuffled for a join:\n$plan")
  }

  test("sim13 IVFADC: probes/table broadcast, only centroid scoring nested-loops") {
    val plan = executed(SparkEntry.queries("sim13_ivfadc")(spark, sf0001))
    // exactly two broadcast nested loops — the deliberate vector ×
    // broadcast-centroid-table cross scores (cells + probes); anything
    // more means a real join degenerated
    assert(countOf(plan, "BroadcastNestedLoopJoin") == 2,
      s"unexpected nested-loop count:\n$plan")
    assert(countOf(plan, "SortMergeJoin") == 0 && !plan.contains("CartesianProduct"),
      s"ADC/probe join regressed from broadcast:\n$plan")
    assert(plan.contains("partial_sum"), s"ADC sum not partial:\n$plan")
  }

  test("g2 triangles: wedge/closure joins are equi-joins, corner count is partial") {
    val plan = executed(SparkEntry.queries("g2_triangles")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop in triangle join:\n$plan")
    assert(plan.contains("partial_count"), s"corner count not partial:\n$plan")
  }

  test("t26 skip-grams: narrow extraction, top-k plans as TakeOrderedAndProject") {
    val plan = executed(SparkEntry.queries("t26_skipgrams")(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"skip-gram top-k became a global sort:\n$plan")
    // one count shuffle — the slice-zip extraction itself must not shuffle
    assert(countOf(plan, "Exchange hashpartitioning") <= 1,
      s"extraction shuffled:\n$plan")
  }

  test("t27 weighted sample: key projection is narrow, top-k never global-sorts") {
    val plan = executed(SparkEntry.queries("t27_weighted_sample")(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"A-Res top-k became a global sort:\n$plan")
    assert(countOf(plan, "Exchange hashpartitioning") == 0,
      s"key computation must not shuffle:\n$plan")
  }

  test("q32 gap fill: grid join and fill window share the key partitioning") {
    val plan = executed(SparkEntry.queries("q32_gapfill")(spark, sf0001))
    // per-hour survivor + bounds agg + grid join + fill window all hash on
    // the series key; nothing explodes into a nested-loop join
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"grid join degenerated:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_max"),
      s"per-key bounds not partial-aggregated:\n$plan")
  }

  test("q33 rolling z-score: one window pass computes all three frame aggregates") {
    val plan = executed(SparkEntry.queries("q33_rolling_zscore")(spark, sf0001))
    assert(countOf(plan, "Window") == 1,
      s"frame aggregates split into multiple window passes:\n$plan")
  }

  test("g3 LPA rounds: keyed equi-joins, partial-aggregable tally and argmax") {
    // the gated query localCheckpoints each round (its executed plan is a
    // checkpoint scan); lock the ROUND plan by disabling truncation
    val shard = col("doc_id") % 300
    val edges = Tables.documents(spark, sf0001)
      .select(shard.as("src"), (shard - shard % 10).as("dst"))
    val df = graft.ops.Graph.labelPropagation(edges, "src", "dst",
      rounds = 2, checkpointEvery = Int.MaxValue)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop in LPA round:\n$plan")
    assert(plan.contains("partial_count") && plan.contains("partial_min"),
      s"tally/argmax not map-side combined:\n$plan")
  }

  test("d19 prefix filter: candidates meet on the prefix-shingle equi-key only") {
    val plan = executed(SparkEntry.queries("d19_prefix_jaccard")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate join degenerated:\n$plan")
  }

  test("t29 KL drift: scalar totals broadcast; top-k is TakeOrderedAndProject") {
    val plan = executed(SparkEntry.queries("t29_kl_drift")(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top movers became a global sort:\n$plan")
    assert(countOf(plan, "BroadcastExchange") >= 2,
      s"totals/kl scalars not broadcast:\n$plan")
  }

  test("t32 token dropout is entirely narrow — zero shuffles before the presentation sort") {
    val plan = executed(SparkEntry.queries("t32_token_dropout")(spark, sf0001))
    // the index-aware filter HOF masks and reassembles row-locally; the
    // corpus must never hash-shuffle (only the final orderBy ranges)
    assert(countOf(plan, "Exchange hashpartitioning") == 0,
      s"dropout mask shuffled:\n$plan")
  }

  test("d21 embedding LSH: band-bucket equi-join, corpus never self-joins raw") {
    val plan = executed(SparkEntry.queries("d21_embedding_lsh")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate join degenerated:\n$plan")
  }

  test("d20 containment: shingle equi-join only, no nested loop") {
    val plan = executed(SparkEntry.queries("d20_containment")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"containment join degenerated:\n$plan")
  }

  test("sim10 MMR rounds join broadcast-selected sets — the corpus never sort-merges") {
    val plan = executed(SparkEntry.queries("sim10_mmr")(spark, sf0001))
    assert(!plan.contains("SortMergeJoin"),
      s"selected-set join fell back to sort-merge:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in MMR scoring:\n$plan")
  }

  test("d22 wide-band LSH: band-bucket equi-join, no degenerate join") {
    val plan = executed(SparkEntry.queries("d22_lsh_wide")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"wide LSH candidate join degenerated:\n$plan")
  }

  test("q43 pivot: one scan, two partial-combined agg shuffles, no distinct pass") {
    val plan = executed(SparkEntry.queries("q43_pivot")(spark, sf0001))
    // the explicit value list means no distinct-values scan: ONE parquet
    // read feeds Spark's two-level pivot plan — pre-aggregate on
    // (user, type), then pivotfirst on user — each level map-side
    // combined before its exchange
    assert(countOf(plan, "FileScan parquet") == 1, s"extra scan:\n$plan")
    assert(countOf(plan, "Exchange hashpartitioning") == 2, s"plan:\n$plan")
    assert(plan.contains("partial_pivotfirst") && plan.contains("partial_count"),
      s"no partial aggregates:\n$plan")
  }

  test("q47 sessionize: lag, running sum, and session agg share ONE shuffle") {
    val plan = executed(SparkEntry.queries("q47_sessionize")(spark, sf0001))
    // both windows sort (user, ts, id) and the final aggregate's
    // (user, sess_idx) clustering is satisfied by the user partitioning
    assert(countOf(plan, "Exchange hashpartitioning") == 1,
      s"window/agg chain re-shuffled:\n$plan")
  }

  test("t41 boilerplate: survivor vocabulary broadcasts to the scoring join") {
    val plan = executed(SparkEntry.queries("t41_boilerplate")(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate set not broadcast:\n$plan")
  }

  test("t42 stratified sample op is narrow — zero shuffles") {
    val e = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("user_id"))
    val plan = executed(graft.ops.Sampling.stratifiedHashSample(
      e, "event_id", "event_type", Map("view" -> 0.1, "purchase" -> 0.5)))
    assert(countOf(plan, "Exchange") == 0, s"sample shuffled:\n$plan")
  }

  test("t43 one-vs-rest prediction: map-side scoring, one equi-join, no window") {
    // (training runs driver-bounded GD jobs before this plan; the scored
    // output itself must stay a narrow map + one doc_id equi-join)
    val plan = executed(SparkEntry.queries("t43_trained_langid")(spark, sf0001))
    assert(countOf(plan, "BroadcastHashJoin") == 1 &&
      countOf(plan, "SortMergeJoin") == 0,
      s"label join regressed from broadcast:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"),
      s"per-class scoring must not rank or cross:\n$plan")
  }

  test("d24 adaptive Jaccard meets only on shingle equi-keys, never nested-loops") {
    val plan = executed(SparkEntry.queries("d24_adaptive_jaccard")(spark, sf0001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate generation degenerated:\n$plan")
  }

  test("t54 DSIR: lambda table and totals broadcast; corpus never sort-merges") {
    val plan = executed(SparkEntry.queries("t54_dsir")(spark, sf0001))
    // the per-doc scoring join against the <=buckets-row lambda frame and
    // the scalar-totals joins must all be broadcast — a SortMergeJoin here
    // means the corpus got shuffled against a 1024-row table
    assert(!plan.contains("SortMergeJoin"), s"corpus sort-merged:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("t51 BM25: probe and df frames broadcast onto the tf relation") {
    val plan = executed(SparkEntry.queries("t51_bm25")(spark, sf0001))
    assert(!plan.contains("SortMergeJoin"), s"posting probe sort-merged:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"degenerate probe:\n$plan")
  }

  test("t53 gopher cascade: two partial-combined aggregations, no window sort") {
    val plan = executed(SparkEntry.queries("t53_gopher_filter")(spark, sf0001))
    // per-(doc,token) counts then the per-doc rollup — both HashAggregate
    // pairs with map-side partials; the cascade itself is a projection
    assert(plan.contains("HashAggregate"), s"no hash aggregation:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("t57 segment dedup: boilerplate head broadcasts, removal join map-side") {
    val plan = executed(SparkEntry.queries("t57_segment_dedup")(spark, sf0001))
    // the df>=minDf survivor set rides a broadcast anti-join — the
    // corpus's segment side must never sort-merge against it, and the
    // reassembly is the only segment-frame shuffle beyond the df agg
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"removal join not a broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus sort-merged:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("q56 incremental agg: delta folds partial-aggregably, merge is keyed — no cartesian") {
    val plan = executed(SparkEntry.queries("q56_incremental_agg")(spark, sf0001))
    // the delta fold and base build are HashAggregates with map-side
    // partials; the merge is a keyed full-outer join — any nested loop
    // here means the view merge would rescan pairs at 100 TB
    assert(plan.contains("HashAggregate"), s"no hash aggregation:\n$plan")
    assert(plan.contains("FullOuter"), s"merge not a full-outer join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"non-keyed join:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window sort:\n$plan")
  }

  test("DD quantiles ops: sketch build partial-aggregable; walk never sort-merges") {
    // audit the ops directly — the t66 query returns pre-collected rows
    // (its guarantee require() materializes them), so its own plan is a
    // LocalTableScan
    val o = Tables.orders(spark, sf0001)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
    val sk = graft.ops.Sketch.ddBuckets(o, "v", 10000L)
    val skPlan = executed(sk)
    assert(skPlan.contains("HashAggregate"), s"no hash aggregation:\n$skPlan")
    assert(!skPlan.contains("Window"), s"corpus window-sorted:\n$skPlan")
    // the rank walk: every join has a rows-scale side (3 quantiles /
    // 1-row totals) — nothing should ever sort-merge
    val qPlan = executed(
      graft.ops.Sketch.ddQuantiles(sk, Seq(500000L, 990000L), 10000L))
    assert(!qPlan.contains("SortMergeJoin"), s"bucket walk sort-merged:\n$qPlan")
  }

  test("q68 point-in-time join is equi-keyed with interval residual, never a nested loop") {
    // the interval predicate must ride as a RESIDUAL on the key equi-join;
    // a planner regression to theta pairing is the 100 TB killer here
    val plan = executed(SparkEntry.queries("q68_point_in_time")(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"point-in-time join planned as a nested loop:\n$plan")
  }

  test("q64 MERGE INTO is one key equi-join, never a nested loop") {
    val plan = executed(SparkEntry.queries("q64_merge_into")(spark, sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"MERGE planned as a nested loop:\n$plan")
  }

  test("io20 deleteWhere hit discovery pushes the predicate to the parquet scan") {
    import org.apache.spark.sql.functions.input_file_name
    val t = "/tmp/graft_io/planaudit/delwhere"
    val p = new org.apache.hadoop.fs.Path(t)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) f.delete(p, true)
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"))
    graft.io.Snapshots.commit(o, t)
    // the same read shape deleteWhere uses for hit discovery: the filter
    // must reach the scan as PushedFilters so non-matching files cost
    // only footer reads at 100 TB
    val dir = f.listStatus(new org.apache.hadoop.fs.Path(s"$t/data"))
      .head.getPath.toString
    val probe = spark.read.parquet(dir).filter(col("prio") === "1-URGENT")
      .select(input_file_name().as("f")).distinct()
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(prio), EqualTo(prio,1-URGENT)]")
      || plan.contains("EqualTo(prio,1-URGENT)"),
      s"delete predicate not pushed to the scan:\n$plan")
  }

  test("KMV sketch: rn<=k gets WindowGroupLimit — shuffle carries O(keys*k), not the corpus") {
    // The scaladoc's scale claim: Catalyst's InferWindowGroupLimit
    // installs a partial bottom-k on the map side of the window
    // shuffle. If a refactor loses the `row_number <= k` shape, the
    // full distinct-value volume hits one sort per key.
    val plan = executed(SparkEntry.queries("t74_kmv_sketch")(spark, sf0001))
    assert(plan.contains("WindowGroupLimit"), s"t74 lost WindowGroupLimit:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"t74 fell off codegen:\n$plan")
  }

  test("q72 basket pairs: pruning lists broadcast, self-join equi-keyed, no cartesian") {
    val plan = executed(SparkEntry.queries("q72_basket_pairs")(spark, sf0001))
    assert(countOf(plan, "CartesianProduct") == 0, s"cartesian in q72:\n$plan")
    // the within-basket pair join is an EQUI-join on the basket id
    // (sort-merge or shuffled-hash, either is the bounded shape);
    // nested-loop joins appear only as broadcast 1-row stats feeds:
    // one inside each of the three freq-subtree references (semi-join
    // prune, supp_a, supp_b) — Catalyst dedupes the expensive parts
    // underneath them via ReusedExchange (asserted below), so the
    // corpus-level support shuffle runs once, not three times
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || countOf(plan, "BroadcastHashJoin") >= 3, s"q72 join shape:\n$plan")
    val bnl = countOf(plan, "BroadcastNestedLoopJoin")
    assert(bnl <= 3, s"q72 has $bnl nested-loop joins (expected only 1-row stats):\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"q72 recomputes the shared support subplan instead of reusing it:\n$plan")
    // support counting combines before its shuffle
    assert(plan.contains("partial_count"), s"q72 lost partial aggregation:\n$plan")
  }

  test("q73 basket triples: a-priori semi-joins stay broadcast, no cartesian") {
    val plan = executed(SparkEntry.queries("q73_basket_triples")(spark, sf0001))
    assert(countOf(plan, "CartesianProduct") == 0, s"cartesian in q73:\n$plan")
    assert(plan.contains("LeftSemi"), s"q73 lost the a-priori semi-join prune:\n$plan")
    assert(plan.contains("partial_count"), s"q73 lost partial aggregation:\n$plan")
  }

  test("t75 AMS: corpus collapses to the count table before the depth fan-out") {
    // the scaladoc's vocab-not-corpus claim: the per-value groupBy
    // (partial-aggregable) runs BEFORE the explode — a fan-out of raw
    // rows would multiply the shuffle by depth
    val plan = executed(SparkEntry.queries("t75_ams_f2")(spark, sf0001))
    assert(plan.contains("partial_count"), s"t75 lost partial aggregation:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"t75 fell off codegen:\n$plan")
    val gen = plan.linesIterator.filter(_.contains("Generate explode")).toSeq
    assert(gen.nonEmpty, s"t75 lost the depth fan-out:\n$plan")
    assert(countOf(plan, "CartesianProduct") == 0, s"cartesian in t75:\n$plan")
  }

  test("t76 PPS sampling: one scalar aggregate broadcast back, membership is a narrow filter") {
    val plan = executed(SparkEntry.queries("t76_pps_sample")(spark, sf0001))
    // the Σw feed is the only join, and it must be the 1-row broadcast
    // shape — a shuffle-partitioned join here would mean the corpus is
    // being co-partitioned just to read one scalar
    assert(countOf(plan, "BroadcastNestedLoopJoin") <= 1
      && countOf(plan, "SortMergeJoin") == 0
      && countOf(plan, "ShuffledHashJoin") == 0,
      s"t76 membership is not a broadcast-scalar filter:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"t76 fell off codegen:\n$plan")
  }

  test("t77 expectations: the whole suite — FK included — rides ONE fact scan") {
    val plan = executed(SparkEntry.queries("t77_expectations")(spark, sf0001))
    // uniqueness rides the SAME aggregate as the row-local checks: with
    // one distinct aggregate Catalyst plans the rewrite as a two-level
    // aggregate keyed on the distinct column (the row-local sums ride
    // along as merge_sum) — with ≥2 distincts it would be Expand; either
    // way the row-local block adds NO extra scan
    assert(plan.contains("Expand") || plan.contains("merge_sum"),
      s"t77 lost the shared-scan distinct rewrite:\n$plan")
    // the FK reference pre-joins as a broadcast flag column — the
    // star-schema shape; an anti-join leg would re-scan the fact table
    assert(plan.contains("BroadcastHashJoin"),
      s"t77 lost the broadcast FK join:\n$plan")
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("orders"))
    assert(scans == 1, s"t77 scans orders $scans times (want 1):\n$plan")
    assert(countOf(plan, "CartesianProduct") == 0, s"cartesian in t77:\n$plan")
  }

  test("kCenterGreedy round: ONE new center broadcast, running dmin " +
      "folded map-side via least, single-row argmax — no groupBy shuffle") {
    import spark.implicits._
    val df = (0L to 99L).map(i => (i, Array(i.toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    graft.expr.VecExpressions.register(spark)
    // audit ONE incremental round: running (cand, cand_vec, dmin) frame
    // × broadcast(new center) → least(dmin, d_new) map-side → max-struct
    val run = df.filter(col("vec_id") =!= 0L)
      .select(col("vec_id").as("cand"), col("embedding").as("cand_vec"),
        lit(5.0).as("dmin")).localCheckpoint()
    val newSel = df.filter(col("vec_id") === 42L)
      .select(col("embedding").as("sel_vec"))
    val pass = run.join(broadcast(newSel))
      .select(col("cand"), col("cand_vec"),
        least(col("dmin"), round(sqrt(graft.functions.VectorFunctions
          .l2NativeSq(col("cand_vec"), col("sel_vec"))), 6)).as("dmin"))
      .agg(max(struct(col("dmin"), (-col("cand")).as("negid"))))
    val plan = executed(pass)
    assert(plan.contains("partial_max"),
      s"k-center argmax lost map-side collapse:\n$plan")
    assert(countOf(plan, "BroadcastExchange") >= 1,
      s"k-center new center not broadcast:\n$plan")
    // the incremental fold must NOT reintroduce a per-candidate groupBy
    // (that was the O(k²·n) form's shuffle — least() replaces it)
    assert(!plan.contains("HashAggregate(keys=[cand"),
      s"k-center round regressed to a keyed aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct") || countOf(plan, "BroadcastNestedLoopJoin") >= 1,
      s"k-center pairing shape:\n$plan")
  }

  test("graft-snapshot DSv2: the pushed filter reaches the scan (manifest " +
      "pruning recorded + inner parquet PushedFilters), columns pruned") {
    import spark.implicits._
    val t = s"/tmp/graft_io/planaudit/dsv2_${java.util.UUID.randomUUID()}"
    graft.io.Snapshots.commitWithBloom(
      Seq(1L, 901L, 13L).map(k => (k, k * 10L, s"pad$k")).toDF("k", "v", "p"),
      t, "k")
    graft.io.Snapshots.commitWithBloom(
      Seq(2L, 900L, 14L).map(k => (k, k * 10L, s"pad$k")).toDF("k", "v", "p"),
      t, "k")
    val q = spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("k") === 901L).select("v")
    // evidence BEFORE rendering the plan (describe re-plans the
    // unfiltered partition list)
    q.collect(): Unit
    val info = graft.sources.SnapshotScans.scanOf(t).get
    assert(info.dirsTotal == 2 && info.dirsRead == 1,
      s"manifest pruning did not reach the scan: $info")
    val plan = executed(q)
    // a plain table rides the NATIVE BATCH scan: the node's rendering
    // carries the translated predicate and the pruned column set — a
    // refactor that loses the pushFilters or pruneColumns wiring fails
    // here, not on a cluster
    assert(plan.contains("BatchScan") && plan.contains("native-batch"),
      s"plain table must plan as the native batch scan:\n$plan")
    assert(plan.contains("EqLongPred(k,901)"),
      s"pushed filter lost before the snapshot scan:\n$plan")
    assert(plan.contains("columns=[k, v]"),
      s"column pruning lost before the snapshot scan:\n$plan")
    // a RENAMED table KEEPS the native batch scan: the per-dir
    // physical read schemas fold the rename at planning (r18), so the
    // rename costs a footer read per dir, not the batch path
    graft.io.Snapshots.renameColumn(spark, t, "p", "pad")
    val v1 = spark.read.format("graft-snapshot").option("path", t).load()
      .filter(col("k") === 901L).select("v")
    assert(v1.count() >= 0)
    val ri = graft.sources.SnapshotScans.scanOf(t).get
    assert(ri.pushed.contains("native-batch") && ri.dirsRead == 1,
      s"a renamed table must stay on the pruned batch path ($ri)")
    val v1Plan = executed(v1)
    assert(v1Plan.contains("BatchScan") && v1Plan.contains("native-batch"),
      s"renamed table must still plan as the native batch scan:\n$v1Plan")
    // and the INNER plan pushed the residual to the parquet footers:
    // the recorded scan frame plans with PushedFilters on k
    val inner = graft.io.Snapshots.readForScan(spark, t,
      preds = Seq(graft.io.Snapshots.EqLongPred("k", 901L)))
    val innerPlan = executed(inner.df.select("v"))
    val scanLine = innerPlan.linesIterator
      .find(_.contains("FileScan parquet")).getOrElse(fail("no parquet scan"))
    assert(scanLine.contains("EqualTo(k,901)"),
      s"residual not pushed to parquet footers: $scanLine")
  }

  test("autocorr: lag fan-out broadcast, pair sums partial before the shuffle") {
    val series = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val plan = executed(
      graft.ops.Timeseries.autocorr(series, "event_type", "h", "cnt", 3))
    assert(plan.contains("partial_sum"),
      s"autocorr pair sums lost map-side combine:\n$plan")
    assert(countOf(plan, "BroadcastExchange") >= 1,
      s"autocorr lag table not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"autocorr pairing degenerated:\n$plan")
  }
}
