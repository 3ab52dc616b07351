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

  /** Stratified deterministic Bernoulli sampling — per-stratum rates at
    * fine (2⁻³²) granularity: a row survives iff the first 32 bits of
    * md5(id) fall below its stratum's threshold. The thresholds are
    * precomputed LONG literals (`⌊rate·2³²⌋` — computed ONCE here, not
    * per-engine: double→int conversion rounds differently across
    * engines, so the integer literal is the contract), which keeps the
    * survive/drop decision an exact integer comparison — the same id
    * survives every run, every engine, every cluster size.
    *
    * This is `sampleBy`/Bernoulli sampling done scale-right: a narrow
    * map + filter, NO shuffle, no RNG state, no seed plumbing — the
    * reproducibility property a training-data pipeline needs when a
    * sample must be reconstructible months later. Strata absent from
    * `rates` are dropped (threshold −1). `hv` (the 32-bit hash value)
    * is emitted for auditability.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0 && r <= 1),
      s"rates out of [0,1]: $rates")
    val hv = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
      16, 10).cast("long")
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(-1L): Column) {
      case (acc, (k, r)) =>
        when(col(stratumCol) === k, lit((r * 4294967296L).toLong)).otherwise(acc)
    }
    df.withColumn("hv", hv).filter(col("hv") < thr)
  }

  /** Deterministic per-group cap — the data-mixing / rebalancing
    * primitive (e.g. cap every language at N documents): keep each
    * group's `cap` rows with the smallest `(hash bucket, id)` key. The
    * hash order makes the kept set a uniform, run-stable pseudo-random
    * sample of the group; the id tiebreak makes it total.
    *
    * This formulation is one window sort per group. At 100 TB skip the
    * full sort with the standard two-pass refinement: count each group,
    * pre-filter `bucket < ceil(cap / n_group · buckets)` (keeps ~cap rows
    * map-side), then exact-trim the survivors with this same window —
    * the window then sorts thousands of rows, not billions.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .drop("rk")
  }

  /** Deterministic mixture sampling — assemble the largest corpus whose
    * group composition matches `targets` (proportions per group value,
    * e.g. language or source weights of a training mix). The achievable
    * size is bound by the scarcest group relative to its target,
    * `K = min_g(n_g / p_g)`; each group then keeps `K·p_g` of its `n_g`
    * rows via the engine-portable hash order ([[hashBucket]] over 10⁶
    * buckets — the kept set is a uniform, run-stable sample, and a row
    * kept at one target stays kept when the target grows).
    *
    * Fully distributed, no driver round-trip: group counts are one
    * partial-aggregable groupBy (|groups| rows), the binding constraint a
    * 1-row aggregate cross-joined back, and membership a broadcast join +
    * codegen'd filter on the corpus — the corpus is scanned once and
    * never shuffled. Groups absent from `targets` are dropped (weight 0).
    */
  def mixToTarget(df: DataFrame, groupCol: String, idCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      s"targets must be positive: $targets")
    val s = df.sparkSession
    import s.implicits._
    val t = targets.toSeq.sortBy(_._1).toDF(groupCol, "__p")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .join(t, groupCol) // inner: untargeted groups drop out
    val k = counts.agg(min(col("__n") / col("__p")).as("__k"))
    val rates = counts.crossJoin(broadcast(k))
      .select(col(groupCol),
        least(col("__k") * col("__p") / col("__n"), lit(1.0)).as("__rate"))
    df.join(broadcast(rates), groupCol)
      .filter(hashBucket(col(idCol), 1000000) <
        floor(col("__rate") * 1000000d).cast("long"))
      .drop("__rate")
  }

  /** Temperature-scaled mixture ([[mixToTarget]] with targets derived
    * from the data): group proportions `p_g ∝ n_g^α` — the α-sampling of
    * the multilingual-pretraining literature (α = 1 keeps the natural
    * distribution, α → 0 approaches uniform; 0.3–0.7 is the usual
    * rare-language up-weighting band).
    *
    * Engine-exact derivation: `n^α` is quantized to integer micro-weights
    * immediately (`round(pow·10⁶)` — absorbing any last-ulp libm `pow`
    * disagreement, the same rule as the ln-based scores), weights are
    * summed as LONGs, and every downstream double (`p_g`, the binding
    * `K`, the rates) is computed from those exact integers in the same
    * expression order on both engines. Same distributed shape as
    * [[mixToTarget]]: no driver round-trip, corpus scanned once, never
    * shuffled.
    */
  def mixByTemperature(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", round(pow(col("__n").cast("double"), alpha) * 1e6, 0).cast("long"))
    val sumw = counts.agg(sum(col("__w")).as("__sw"))
    val t = counts.crossJoin(broadcast(sumw))
      .withColumn("__p", col("__w").cast("double") / col("__sw"))
    val k = t.agg(min(col("__n") / col("__p")).as("__k"))
    val rates = t.crossJoin(broadcast(k))
      .select(col(groupCol),
        least(col("__k") * col("__p") / col("__n"), lit(1.0)).as("__rate"))
    df.join(broadcast(rates), groupCol)
      .filter(hashBucket(col(idCol), 1000000) <
        floor(col("__rate") * 1000000d).cast("long"))
      .drop("__rate")
  }

  /** Deterministic weighted sample WITHOUT replacement, k rows — the
    * Efraimidis–Spirakis A-Res order-sampling scheme: each row draws a
    * uniform `u` and takes key `u^(1/w)`; the k largest keys are a
    * weighted-without-replacement sample. Worked in log space
    * (`ln(u)/w`, same argmax) so heavy weights don't underflow.
    *
    * Seed-free and engine-portable: `u` derives from md5(id) (first 12
    * hex = 48 uniform bits, +0.5 so u ∈ (0,1) — `ln(0)` never fires),
    * and the key is quantized to integer micro-units
    * (`round(ln(u)/w · 10⁶)` — the same rule that absorbs last-ulp
    * libm `ln` disagreement in the surprisal scores). A row's key never
    * changes as the corpus grows, so the sample is stable under
    * appends — only genuinely better keys displace members.
    *
    * Distributed shape: one narrow codegen'd projection computes keys,
    * and the global top-k plans as `TakeOrderedAndProject` —
    * per-partition partial top-k, k rows per partition to the driver-
    * side merge, never a global sort. Weights must be positive (rows
    * with w ≤ 0 are dropped: zero weight means zero inclusion mass).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u48 = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val u = (u48.cast("double") + 0.5) / 281474976710656.0
    df.filter(col(weightCol) > 0)
      .withColumn("key_micro",
        round(log(u) / col(weightCol).cast("double") * 1e6, 0).cast("long"))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
  }

  /** Materialize [[packShards]] output into actual training sequences:
    * one row per (bucket, shard) with the member documents concatenated
    * in pack order (space-separated — the tokenizer-neutral join; a real
    * pipeline would splice its own separator token). `array_sort` over
    * `(start_off, id, text)` structs gives a deterministic order without
    * relying on `collect_list`'s arrival order; one shuffle on the shard
    * key, shard payloads are budget-bounded by construction.
    */
  def packTexts(packed: DataFrame, idCol: String, textCol: String): DataFrame =
    packed.groupBy("bucket", "shard")
      .agg(array_sort(collect_list(
        struct(col("start_off"), col(idCol), col(textCol)))).as("members"))
      .select(col("bucket"), col("shard"),
        size(col("members")).as("n_docs"),
        concat_ws(" ", transform(col("members"), m => m.getField(textCol)))
          .as("packed_text"))

  /** Pack documents into training shards of ~`budget` tokens (sequence
    * packing): a document's shard is the budget-boundary its cumulative
    * start offset falls in, within its hash partition.
    *
    * Packing is inherently a sequential recurrence, so it is made
    * PARTITION-PARALLEL by design: documents first hash into `partitions`
    * independent streams ([[hashBucket]] — deterministic, engine-portable),
    * and the running-offset window runs per bucket. At 100 TB that is the
    * only packing that works — one global ordered window would serialize
    * the corpus through a single task, while per-bucket windows scale with
    * the cluster and still produce ≥(budget-1)/budget-full shards.
    * Adds `bucket`, `start_off`, `shard` columns; `(bucket, shard)` is the
    * shard key.
    */
  def packShards(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, partitions: Int): DataFrame = {
    require(budget > 0 && partitions > 0, s"bad packing params: $budget/$partitions")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", hashBucket(col(idCol), partitions))
      .withColumn("start_off", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("shard", floor(col("start_off") / budget).cast("long"))
  }

  /** Dense GLOBAL row index 0..n−1 in `orderCol` order (`global_id`
    * appended) — the stable contiguous id assignment a training corpus
    * needs for sharding, checkpoint-resumable iteration, and
    * example-to-id maps. Neither built-in gives this at scale:
    * `monotonically_increasing_id` is partition-sparse (gaps of 2³³),
    * and `row_number()` over an empty window IS the scale-killer — one
    * global sort on a single reducer. This is the classic two-pass
    * shape instead: range-repartition + in-partition sort (a real
    * distributed sort, every partition in parallel), then
    * `zipWithIndex` (one lightweight count job for the per-partition
    * offsets, then a narrow map attaching `offset + local index`). The
    * RDD hop is the documented exception — per-partition imperative
    * indexing is exactly what the Dataset API cannot express without
    * the global-window trap.
    *
    * `orderCol` must be unique (a key) for the assignment to be
    * deterministic — enforced here by requiring the caller name a
    * column, and verified cheaply at 100 TB by gating ingest on t19's
    * profiler (`n_distinct == n_rows`).
    */
  def withGlobalIndex(df: DataFrame, orderCol: String): DataFrame = {
    val s = df.sparkSession
    val parts = s.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = sorted.schema.add("global_id",
      org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    s.createDataFrame(rdd, schema)
  }

  /** Deterministic per-epoch training order: epoch `e`'s permutation
    * ranks documents by `md5("epoch#e#id")` — a fresh, reproducible,
    * RNG-free shuffle per epoch (the training-loader contract: every
    * worker, restart, and engine derives the SAME order, and no two
    * epochs repeat an order). Sequence numbers come from
    * [[withGlobalIndex]]'s range-sort + zipWithIndex two-pass — never a
    * corpus-wide `row_number` window. The hash key is suffixed with the
    * zero-padded id so the order column is total even on the (2⁻¹²⁸)
    * digest collision.
    *
    * @return (epoch, seq, doc_id): seq is 0..n−1 within each epoch
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be positive: $epochs")
    (0 until epochs).map { e =>
      val keyed = df.select(col(idCol).as("doc_id"))
        .withColumn("ord", concat(
          md5(concat_ws("#", lit("epoch"), lit(e).cast("string"),
            col("doc_id").cast("string"))),
          lpad(col("doc_id").cast("string"), 20, "0")))
      withGlobalIndex(keyed, "ord")
        .select(lit(e).cast("long").as("epoch"),
          col("global_id").as("seq"), col("doc_id"))
    }.reduce(_ unionByName _)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed-n-gram profile is,
    * `w(d) = Σ_f cnt_d(f) · (ln p_target(f) − ln p_raw(f))`, with
    * unigram+bigram features hashed into `buckets` cells and add-1
    * smoothing over the bucket space. Deterministic top-k selection
    * (weight desc, id asc) instead of the paper's Gumbel resampling —
    * no RNG state, same contract as every sampler here.
    *
    * Float discipline: the per-BUCKET log-ratio λ_f is micro-rounded to
    * a LONG once (≤ `buckets` values), and each document's score is the
    * exact integer `Σ cnt·λ` — order-free and engine-exact. λ is bounded
    * by ln(corpus) ≈ 40·10⁶ micro, so the per-doc sum stays under 2⁶³
    * up to ~10¹⁴ feature occurrences per document.
    *
    * Scale shape: one explode over the corpus for features, two
    * partial-aggregable counts (target slice + raw), and a ≤`buckets`-row
    * λ table BROADCAST into the per-doc scoring join — the corpus is
    * touched twice, never joined to itself. The global rank window here
    * is gate-scale convenience; at 100 TB replace it with a weight
    * threshold read off [[graft.ops.Sketch]]-style binned quantiles
    * (q37) and keep selection embarrassingly parallel.
    */
  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int, topK: Int): DataFrame = {
    require(buckets >= 2 && topK >= 1, s"bad params buckets=$buckets topK=$topK")
    val toks = df.select(col(idCol).as("doc_id"), isTarget.as("is_target"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("ts"))
    val uni = toks.select(col("doc_id"), col("is_target"), explode(col("ts")).as("f"))
    val big = toks.select(col("doc_id"), col("is_target"),
      explode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("f"))
    val fe = uni.unionByName(big)
      .select(col("doc_id"), col("is_target"),
        Sketch.cmsBucket(col("f"), 0, buckets).as("b"))
    val dc = fe.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
    val tc = fe.filter(col("is_target")).groupBy("b").agg(count(lit(1)).as("ct"))
    val rc = fe.groupBy("b").agg(count(lit(1)).as("cr"))
    val tt = fe.filter(col("is_target")).agg(count(lit(1)).as("ct_tot"))
    val rt = fe.agg(count(lit(1)).as("cr_tot"))
    val lam = rc.join(tc, Seq("b"), "left")
      .crossJoin(broadcast(tt)).crossJoin(broadcast(rt))
      .select(col("b"),
        round((log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
            / (col("ct_tot") + lit(buckets.toLong)))
          - log((col("cr") + 1).cast("double")
            / (col("cr_tot") + lit(buckets.toLong)))) * 1e6, 0)
          .cast("long").as("lam"))
    val w = dc.join(broadcast(lam), "b")
      .groupBy("doc_id").agg(sum(col("cnt")).as("n_feat"),
        sum(col("cnt") * col("lam")).as("dsir_micro"))
    import org.apache.spark.sql.expressions.Window
    w.withColumn("rank", row_number()
        .over(Window.orderBy(desc("dsir_micro"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("n_feat"), col("dsir_micro"), col("rank"),
        (col("rank") <= topK).as("selected"))
  }

  /** Token-budget-constrained corpus selection: keep the highest-
    * [[graft.functions.TextFunctions.qualityScore]] documents whose
    * total token count fits `budgetTokens` — "train on the best N
    * tokens", the compute-optimal curation cut, decided WITHOUT a
    * corpus-wide running-sum window (a global `sum().over(orderBy)` is
    * one reducer sorting 100 TB).
    *
    * Two-pass threshold shape (q37's sortless-percentile idea applied
    * to a budget): (1) one partial-aggregable histogram over the
    * 6-rounded score (≤ 10⁶+1 distinct micro values, so the cumulative
    * window runs over a VOCAB-scale frame, not the corpus); (2) the
    * boundary score + its residual budget — ONE row — comes back to the
    * driver, and selection is a map-side filter against the two
    * literals. Only documents AT the boundary score need an order (the
    * deterministic (md5, id) tie-break): that window partitions on the
    * single boundary value, a hot key bounded by the tie population at
    * exactly the cut score — corpus/10⁶ in expectation under the
    * micro-rounding, and the documented two-pass refinement (re-bin
    * inside the boundary) if a degenerate score distribution piles up.
    *
    * @return (doc_id, score_micro, n_tokens) — the selected documents;
    *         Σ n_tokens ≤ budget, maximal under the (score, hash, id)
    *         priority order
    */
  def tokenBudgetSelect(df: DataFrame, textCol: String, idCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"negative budget $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions
    val scored = df.select(col(idCol).as("doc_id"),
      round(TextFunctions.qualityScore(col(textCol)) * 1e6, 0).cast("long")
        .as("score_micro"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val hist = scored.groupBy("score_micro").agg(sum("n_tokens").as("tok"))
    val cum = hist.withColumn("cum",
      sum(col("tok")).over(Window.orderBy(col("score_micro").desc)))
    // the highest score whose INCLUSIVE prefix overflows the budget is
    // the boundary; tokens strictly above it are already spent
    val bound = cum.filter(col("cum") > budgetTokens)
      .orderBy(col("score_micro").desc).limit(1)
      .select(col("score_micro"),
        (lit(budgetTokens) - (col("cum") - col("tok"))).as("remaining"))
      .collect() // ≤ 1 row — a driver-sized aggregate, not corpus data
    val sel = bound match {
      case Array() => scored // the whole corpus fits the budget
      case Array(b) =>
        val bScore = b.getLong(0)
        val wb = Window.partitionBy("score_micro")
          .orderBy("h", "doc_id")
        val keptAtBoundary = scored.filter(col("score_micro") === bScore)
          .withColumn("h", md5(concat_ws("#", lit("budget"),
            col("doc_id").cast("string"))))
          .withColumn("crun", sum(col("n_tokens")).over(wb))
          .filter(col("crun") <= b.getLong(1))
          .drop("h", "crun")
        scored.filter(col("score_micro") > bScore).unionByName(keptAtBoundary)
    }
    sel.select(col("doc_id"), col("score_micro"), col("n_tokens"))
  }

  /** PPS (probability-proportional-to-size) Poisson sampling — each row
    * included independently with probability `min(1, n·w_i/Σw)`, the
    * Horvitz–Thompson design behind importance-weighted corpus subsets
    * ("sample documents proportional to token count / quality mass").
    * The third sampling mode beside [[stratifiedHashSample]] (uniform
    * within stratum) and [[weightedSample]] (fixed-k A-ES): expected
    * size n, EXACTLY integer — no libm anywhere. Inclusion is
    * `md5-u32(id) < ⌊n · w_i · 2³² / Σw⌋`, the whole threshold
    * computed in DECIMAL(38,0) (`n·w·2³² ≤ 10⁶·10¹⁸·2³² < 10³⁸` for
    * micro-unit weights to 10¹², i.e. any realistic per-doc token
    * count), floor-divided once — so the survive/drop decision is the
    * same exact integer comparison on every engine, run, and cluster
    * size, and the sample is an append-stable pure function of the id.
    *
    * Scale shape: ONE aggregate produces the scalar Σw (broadcast
    * back); membership is then a narrow codegen'd map+filter — no
    * shuffle, no sort, no per-row state. `thr` is emitted for
    * auditability (the HT estimator `Σ_kept w_i·2³²/thr_i` reconstructs
    * totals unbiasedly downstream).
    */
  def ppsPoissonSample(df: DataFrame, idCol: String, weightCol: String,
      targetN: Long): DataFrame = {
    require(targetN > 0, s"targetN must be positive: $targetN")
    // The exact-integer design REQUIRES integral weights: a fractional
    // weight would be silently rounded by the DECIMAL(38,0) cast (a row
    // with 0 < w < 0.5 passes the w > 0 filter yet gets thr = 0 and can
    // never be sampled, and Σw sums the rounded values), so reject the
    // dtype loudly and tell the caller the standard move — scale to
    // micro-units (an integral column) at a fixed documented scale.
    df.schema(weightCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case d: org.apache.spark.sql.types.DecimalType if d.scale == 0 => ()
      case other => throw new IllegalArgumentException(
        s"ppsPoissonSample: weight column '$weightCol' is $other; the " +
          "exact-integer inclusion rule needs an integral weight " +
          "(tokens, bytes, micro-units) — pre-scale fractional weights " +
          "to a fixed integer unit, e.g. round(w * 1e6) as micro-weight")
    }
    val tot = df.filter(col(weightCol) > 0)
      .agg(sum(col(weightCol).cast("decimal(38,0)")).as("w_total"))
    val hv = conv(substring(md5(concat(lit("pps:"),
      col(idCol).cast("string")).cast("binary")), 1, 8), 16, 10).cast("long")
    df.filter(col(weightCol) > 0)
      .crossJoin(broadcast(tot))
      .withColumn("thr", least(lit(4294967296L), expr(
        s"(CAST($targetN AS DECIMAL(38,0)) * CAST($weightCol AS DECIMAL(38,0))"
          + " * CAST(4294967296 AS DECIMAL(38,0))) div w_total")))
      .withColumn("hv", hv)
      .filter(col("hv") < col("thr"))
      .drop("w_total")
  }
}
