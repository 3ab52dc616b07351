package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale corpus curation: exact
  * (fingerprint group-by), n-gram Jaccard (exact pairwise baseline),
  * MinHash+LSH (the at-scale near-dup path), SimHash (bit-sketch variant).
  *
  * Scale posture (100 TB): exact dedup and MinHash/LSH are the production
  * paths — one shuffle on the fingerprint / band hash respectively, with
  * map-side signature computation (array expressions, no UDFs, no state).
  * The exact-Jaccard and SimHash all-pairs forms are correctness baselines
  * for the sketch paths; their joins explode quadratically and are
  * deliberately confined to verification scale factors.
  *
  * Every derivation matches the DuckDB oracle SQL in SparkEntry
  * token-for-token (md5-based hashing — stable across engines; list ops
  * with set semantics on both sides).
  */
object Dedup {

  /** Distinct word n-gram shingles (space-joined); empty array when the
    * document has fewer than `n` tokens.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash over the universal-hash permutation family
    * π_i(h) = (a_i·h + b_i) mod p, p = 2³¹−1, over a 31-bit base hash of
    * each shingle (first 8 hex chars of its md5, mod p).
    *
    * Why this exact construction:
    *   - ONE md5 per shingle, not k — the earlier per-salt form
    *     (min over md5("i:"+s) for each i) burned 12 md5+conv calls per
    *     shingle row and profiled as the entire d3 runtime
    *     (NumberConverter.convert dominating a 60 s task).
    *   - All-primitive LONG arithmetic: the k-way `min` aggregation buffer
    *     is fixed-width, staying inside codegen'd HashAggregate. A STRING
    *     buffer (full md5 hex) routed to ObjectHashAggregate, whose silent
    *     128-key sort fallback measured 5 s vs 229 s run-to-run.
    *   - Engine-portable bit-for-bit: DuckDB mirrors the base hash as
    *     `CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % 2147483647` and
    *     the permutations as plain BIGINT arithmetic (a_i·h < 2⁶² — no
    *     overflow on either engine).
    */
  val MinhashP: Long = 2147483647L // 2^31 − 1 (Mersenne prime)

  /** Fixed permutation coefficients — deterministic, nonzero mod p. */
  def minhashA(i: Int): Long = ((i + 1) * 1000003L) % MinhashP
  def minhashB(i: Int): Long = (i * 999983L + 12345L) % MinhashP

  /** 31-bit base hash of a shingle (engine-portable, see above). */
  def baseHash(shingle: Column): Column =
    pmod(conv(substring(md5(shingle.cast("binary")), 1, 8), 16, 10).cast("long"), lit(MinhashP))

  /** π_i applied to a base hash. */
  def permuted(i: Int, h: Column): Column =
    (h * lit(minhashA(i)) + lit(minhashB(i))) % lit(MinhashP)

  /** MinHash signature: sig_i = min over shingles of π_i(baseHash(s)).
    * Pure array expressions → computed map-side, no shuffle.
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val hs = transform(shingles, s => baseHash(s))
    array((0 until k).map { i =>
      array_min(transform(hs, h => permuted(i, h)))
    }: _*)
  }

  /** LSH band hashes: group the `k` signature values into bands of `r`,
    * hash each band (longs rendered as decimal strings — identical in any
    * engine). Docs sharing any band hash become candidate pairs — the only
    * shuffle key in the at-scale near-dup join.
    */
  def lshBands(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, s"k=$k not divisible by band size r=$r")
    array((0 until k / r).map { j =>
      md5(concat_ws("|",
        (0 until r).map(i => element_at(sig, j * r + i + 1).cast("string")): _*).cast("binary"))
    }: _*)
  }

  /** Exact Jaccard similarity of two distinct-element arrays. Integer
    * cardinalities → the double division is engine-exact.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact dedup groups by content fingerprint: fingerprint, group size,
    * and the surviving (minimum) id per group. One hash-partition shuffle
    * on the 32-hex fingerprint — the canonical 100 TB dedup shape.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** Incremental dedup — the nightly-ingest shape: label each NEW document
    * as a duplicate of the HISTORICAL corpus (or not) by content
    * fingerprint. A left join against the deduplicated historical
    * fingerprint set: one map-side fingerprint per side, history deduped
    * before the join, shuffle on the fingerprint. At 100 TB the history
    * side is a pre-materialized fingerprint table (one 16-byte hash per
    * doc, bucketable on the fingerprint so nightly runs join shuffle-free)
    * — never the corpus itself.
    */
  def incrementalDedup(history: DataFrame, fresh: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val hist = history
      .select(TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .distinct()
      .withColumn("is_dup", lit(true))
    fresh
      .select(col(idCol).as("id"), TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .join(hist, Seq("fingerprint"), "left")
      .select(col("id"), col("fingerprint"), coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** [[incrementalDedup]] with a BLOOM-FILTER negative prefilter — the
    * nightly-ingest shape when history is enormous and almost all fresh
    * documents are new: the history fingerprint set is summarized into a
    * distributed-built Bloom filter (`df.stat.bloomFilter` runs a
    * treeAggregate; bitmap OR is order-independent, so the sketch is
    * deterministic) and broadcast, and fresh rows it rejects are marked
    * unique MAP-SIDE — they never reach the join shuffle. Only the
    * `might_contain` survivors (true dups + the fpp false positives) join
    * history exactly, so the shuffle volume tracks the DUPLICATE rate,
    * not the batch. Bloom has no false negatives and every positive is
    * re-verified by the exact join, so the output equals
    * [[incrementalDedup]]'s row-for-row at ANY fpp — the gate runs both
    * against the same oracle.
    *
    * Both sketch sides are NATIVE Catalyst expressions (Spark ships
    * `BloomFilterAggregate`/`BloomFilterMightContain` for its own
    * runtime join pruning but leaves them off the public Column API —
    * we register them as session functions): the build is a partial-
    * aggregable distributed aggregate (bitmap OR is order-free, so the
    * sketch is deterministic), and the probe is a codegen'd expression
    * over the serialized-filter literal — no ScalaUDF boxing in the
    * per-row path, and the probing stage stays inside whole-stage
    * codegen (PlanAuditSpec locks the shape). Values enter the filter
    * as `xxhash64(fingerprint)` longs (the expressions' native domain);
    * hash-of-hash cannot introduce false negatives, and false positives
    * of any origin are killed by the exact join. A null-text row hashes
    * to the xxhash64 seed; whichever branch it lands in, the exact join
    * drops its null fingerprint key, matching [[incrementalDedup]].
    */
  def incrementalDedupBloom(history: DataFrame, fresh: DataFrame,
      textCol: String, idCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val s = fresh.sparkSession
    val reg = s.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val histFp = history
      .select(TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
    val bloomBytes = histFp
      .agg(call_function("graft_bloom_agg", xxhash64(col("fingerprint")),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val f = fresh
      .select(col(idCol).as("id"),
        TextFunctions.fingerprintMd5(col(textCol)).as("fingerprint"))
      .withColumn("__cand",
        call_function("graft_might_contain", lit(bloomBytes),
          xxhash64(col("fingerprint"))))
    val hist = histFp.distinct().withColumn("is_dup", lit(true))
    f.filter(col("__cand"))
      .join(hist, Seq("fingerprint"), "left")
      .select(col("id"), col("fingerprint"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
      .unionByName(f.filter(!col("__cand"))
        .select(col("id"), col("fingerprint"), lit(false).as("is_dup")))
  }

  /** All candidate near-dup pairs by exact n-gram Jaccard ≥ threshold.
    * Candidates = pairs sharing at least one shingle (exploded self-join on
    * the shingle — correct but worst-case quadratic; see [[minhashDupPairs]]
    * for the sketch path).
    */
  /** Distinct (id, shingle) rows: one native codegen'd
    * [[graft.expr.WordShingles]] call per document (tokenize → n-grams →
    * dedup in a tight loop), exploded. ZERO shuffles — the two previous
    * formulations both proved pathological at bench scale: the HOF chain
    * (`transform(sequence...)`) is CodegenFallback (interpreted per row,
    * ~70 s codegen compile per shape), and the posexplode+window-lead+
    * distinct pipeline cost two shuffles whose recomputation inside
    * auto-broadcast build jobs dominated the minhash runtime. The explicit
    * repartition spreads documents across cores first — a single-file scan
    * otherwise computes every shingle in one task (and at 100 TB the
    * repartition is a no-op cost next to the scan).
    */
  def explodedShingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    graft.expr.VecExpressions.register(df.sparkSession)
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("id"),
        explode(call_function("word_shingles", col(textCol), lit(n))).as("s"))
  }

  def jaccardDupPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    val ex = explodedShingles(df, textCol, idCol, n)
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh"))
    // |A ∩ B| by counting shared shingles — one aggregation, never
    // materializes per-pair arrays; J = c / (|A| + |B| − c)
    val inter = ex.as("a").join(ex.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("id1"), col("n_sh").as("n1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("n_sh").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        (col("c").cast("double") / (col("n1") + col("n2") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric CONTAINMENT near-dup pairs: `c / min(|A|, |B|)` — the
    * small-document-inside-big-document case Jaccard structurally
    * misses (a 40-shingle doc fully embedded in a 4000-shingle doc has
    * Jaccard ≈ 0.01 but containment 1.0 — quote farms, boilerplate
    * wrappers, excerpt pages). Same shared-shingle counting shape as
    * [[jaccardDupPairs]] (this is the exact baseline; [[winnowDupPairs]]
    * is the sketch-based scale path for the same partial-overlap
    * geometry, and the d14 span recovery names the overlap itself).
    */
  def containmentDupPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    val ex = explodedShingles(df, textCol, idCol, n)
    val sizes = ex.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("id1"), col("n_sh").as("n1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("n_sh").as("n2")), "id2")
      .select(col("id1"), col("id2"), col("n1"), col("n2"),
        (col("c").cast("double") / least(col("n1"), col("n2"))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Exact Jaccard pairs via PREFIX FILTERING (the PPJoin family,
    * Xiao et al. 2011) — same answer as [[jaccardDupPairs]], different
    * candidate generator: instead of joining on EVERY shared shingle
    * (the all-pairs shape whose Zipf-head shingles each produce a
    * quadratic bucket), documents meet only through their prefix — the
    * `n − ⌈t·n⌉ + 1` globally RAREST shingles of each document. Two
    * documents with Jaccard ≥ t must share at least one prefix shingle
    * (pigeonhole on the ⌈t·n⌉ overlap they need), so the filter is
    * LOSSLESS — which is why the gate can hold this op to the all-pairs
    * oracle, not a recall target. Head shingles ("the quick") sit at the
    * END of the frequency order and never enter a prefix, so the
    * candidate join's buckets are rare-shingle-sized — this is the
    * all-pairs scale fix when LSH's probabilistic recall
    * ([[minhashDupPairs]]) isn't acceptable.
    *
    * Candidate-side size filter (`t·n1 ≤ n2 ∧ t·n2 ≤ n1`) prunes pairs
    * whose lengths already cap Jaccard below t; both filters only shrink
    * the VERIFY set — every surviving candidate is exactly verified on
    * its own shingle arrays (`array_intersect`, per-pair work bounded by
    * document length, no global re-join).
    *
    * Shuffles: shingle-frequency count, per-doc rank window (partitioned
    * by doc — bounded by document length), prefix equi-join, and the
    * pair distinct. All keyed, all skew-safe by the rarity argument.
    * The crossover is corpus-shape-dependent: on the small, dup-sparse
    * bench fixture the fixed extra shuffles cost more than the all-pairs
    * join they avoid ([[jaccardDupPairs]] wins at sf0.1); the prefix
    * form wins exactly when the shared-shingle join's hot buckets
    * explode — Zipf-heavy natural text at corpus scale.
    */
  def prefixJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    graft.expr.VecExpressions.register(df.sparkSession)
    // deliberately NOT persisted: the frame is consumed three times
    // (candidate path + both verify sides), but materializing the
    // shingle arrays measured slower than recomputing the codegen'd
    // word_shingles kernel (5.3 s vs 4.1 s at sf0.1) — cache only when
    // the upstream is an expensive scan, not a cheap expression
    //
    // CONDITIONAL spread, not an unconditional exchange: a small-file
    // local input (the sf0.01 gate reads ONE parquet file → 1-2 splits)
    // starves the 3× shingle recompute of parallelism, so spread it to
    // the shuffle width; but when upstream already carries adequate
    // splits — any real corpus, where the scan yields thousands — a
    // corpus-wide repartition of raw TEXT is pure cost (the candidate
    // and verify joins exchange on their own keys regardless), so skip
    // it. The planning-time getNumPartitions probe compiles the plan
    // but runs no job. MEASURED at sf0.1/local[32] (single-file input,
    // so the spread branch is active; min-of-3 interleaved passes):
    // 4.04 s with the spread vs 7.47 s with it removed — the 1.85×
    // regression without it is the starved shingle recompute, keeping
    // the conditional exactly as justified above.
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val spread =
      if (df.rdd.getNumPartitions * 2 < width) df.repartition(width) else df
    val withSh = spread
      .select(col(idCol).as("id"),
        call_function("word_shingles", col(textCol), lit(n)).as("sh"))
    val ex = withSh.select(col("id"), explode(col("sh")).as("s"))
    val freq = ex.groupBy("s").agg(count(lit(1)).as("df_s"))
    val rankW = Window.partitionBy("id").orderBy(col("df_s"), col("s"))
    val sized = ex.join(freq, "s")
      .withColumn("pos", row_number().over(rankW))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("id")))
    val prefix = sized
      .filter(col("pos") <= col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
      .select(col("id"), col("s"), col("n_sh"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          lit(threshold) * col("a.n_sh") <= col("b.n_sh") &&
          lit(threshold) * col("b.n_sh") <= col("a.n_sh"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    cands
      .join(withSh.select(col("id").as("id1"), col("sh").as("sh1")), "id1")
      .join(withSh.select(col("id").as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long").as("c"),
        size(col("sh1")).cast("long").as("n1"), size(col("sh2")).cast("long").as("n2"))
      .select(col("id1"), col("id2"),
        (col("c").cast("double") / (col("n1") + col("n2") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** ADAPTIVE exact-Jaccard candidate generation: pick [[jaccardDupPairs]]
    * (all shared-shingle pairs) or [[prefixJaccardPairs]] (PPJoin prefix
    * filtering) from the measured shingle document-frequency shape —
    * the crossover the two ops' scaladocs describe, decided by data
    * instead of by the caller. Both branches are exact and lossless, so
    * the result is branch-independent (gate: the d24 query holds this to
    * the same all-pairs oracle as d2/d19).
    *
    * The statistic: the all-pairs candidate join emits exactly
    * `Σ_s C(df_s, 2)` pre-dedup pairs (one per shared-shingle
    * co-occurrence), against `Σ_s df_s` exploded shingle rows of input.
    * When the pair blowup exceeds `costFactor ×` the input rows — Zipf
    * head buckets going quadratic — the fixed extra shuffles of prefix
    * filtering pay for themselves; below it, all-pairs' two-shuffle plan
    * wins (measured at sf0.1: all-pairs 1.1 s vs prefix 4.3 s on the
    * dup-sparse fixture — the selector correctly picks all-pairs there).
    * `costFactor = 8` puts the switch well past measurement noise but
    * far before quadratic pain.
    *
    * Cost of deciding: ONE partial-aggregable count pass over the
    * exploded shingles to the driver as a single 2-long row (`df_s` sums
    * in DECIMAL(38) — a 10⁹-doc hot shingle already overflows a LONG at
    * the square). At 100 TB run the stats on a deterministic document
    * sample (`statsEveryNth` > 1: docs with `id % n == 0`; df scales
    * ~1/n, pair counts ~1/n², so compare `cand·n² > costFactor·rows·n` —
    * the selector applies the correction internally). The decision scan
    * reuses the same codegen'd shingle kernel the chosen branch runs.
    */
  def adaptiveJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double, costFactor: Double = 8.0,
      statsEveryNth: Int = 1): DataFrame = {
    require(costFactor > 0 && statsEveryNth >= 1,
      s"bad selector params: costFactor=$costFactor statsEveryNth=$statsEveryNth")
    val statsIn =
      if (statsEveryNth == 1) df else df.filter(col(idCol) % statsEveryNth === 0)
    val row = explodedShingles(statsIn, textCol, idCol, n)
      .groupBy("s").agg(count(lit(1)).as("df_s"))
      .agg(sum(col("df_s").cast("decimal(38,0)")).as("rows"),
        sum(col("df_s").cast("decimal(38,0)") * (col("df_s") - 1) / 2).as("cand"))
      .collect()(0)
    val shingleRows = Option(row.getDecimal(0)).map(_.doubleValue()).getOrElse(0d)
    val candPairs = Option(row.getDecimal(1)).map(_.doubleValue()).getOrElse(0d)
    val blowup = candPairs * statsEveryNth * statsEveryNth
    val input = shingleRows * statsEveryNth
    if (blowup > costFactor * input)
      prefixJaccardPairs(df, textCol, idCol, n, threshold)
    else
      jaccardDupPairs(df, textCol, idCol, n, threshold)
  }

  /** Near-dup pairs via MinHash + LSH banding, verified with exact Jaccard.
    * The shuffle is on (band index, band hash) — at 100 TB this is the only
    * wide edge, and bucket sizes stay bounded because a band collision
    * already implies high similarity.
    */
  def minhashDupPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int, r: Int, threshold: Double): DataFrame = {
    require(k % r == 0, s"k=$k not divisible by band size r=$r")
    val ex = explodedShingles(df, textCol, idCol, n)
    // ONE base hash per shingle row, computed MAP-SIDE at the scan's (or
    // explodedShingles' repartition) parallelism; the k permutations are
    // 2 mul/add/mod LONG ops each (see [[baseHash]]/[[permuted]] — the
    // per-salt md5 form was the entire d3 runtime). k primitive `min`s +
    // the shingle count fold into a single codegen'd HashAggregate pass
    // with map-side partials, so the only shuffle carries one row per
    // (id, partition).
    val exH = ex.select(col("id"), baseHash(col("s")).as("h"))
    val sigAggs = (0 until k).map(i =>
      min(permuted(i, col("h"))).as(s"h$i")) :+ count(lit(1)).as("n_sh")
    // persist the SIGNATURES, not the exploded corpus: one row of k longs
    // per document (the sketch artifact — ~100 bytes/doc, disk-spillable
    // at any scale) versus shingle-cardinality rows. The band self-join
    // consumes this relation on both sides and the candidate broadcast a
    // third time; without the persist each consumer re-runs the scan →
    // shingle → hash → combine lineage. ContextCleaner drops the blocks
    // once the frame is unreferenced.
    val sigs = exH.groupBy("id").agg(sigAggs.head, sigAggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandArr = array((0 until k / r).map { j =>
      md5(concat_ws("|",
        (0 until r).map(i => col(s"h${j * r + i}").cast("string")): _*).cast("binary"))
    }: _*)
    val banded = sigs.select(col("id"), col("n_sh"),
      posexplode(bandArr).as(Seq("band_idx", "band_hash")))
    // candidate pairs carry both shingle counts so the verify join below
    // needs no extra pass over `ex` for sizes
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.n_sh").as("n1"), col("b.n_sh").as("n2")).distinct()
    // verify candidates in ONE pass over `ex` (the exploded corpus is the
    // expensive relation — it must not be computed once per join side):
    // explode each candidate pair into its two member ids, broadcast
    // (candidates are rare by design), join the corpus shingles once, and
    // count the shingles seen from BOTH members — |A ∩ B| — then
    // J = c / (n1 + n2 − c).
    val members = cand.select(
      struct(col("id1"), col("id2"), col("n1"), col("n2")).as("p"),
      explode(array(col("id1"), col("id2"))).as("id"))
    ex.join(broadcast(members), "id")
      .groupBy(col("p"), col("s")).agg(count(lit(1)).as("sides"))
      .filter(col("sides") === 2)
      .groupBy("p").agg(count(lit(1)).as("c"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"),
        (col("c").cast("double") / (col("p.n1") + col("p.n2") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Cross-corpus fuzzy decontamination pairs — [[minhashDupPairs]]' LSH
    * machinery in TWO-relation form: eval/test documents banded against
    * the training corpus, so the candidate join is strictly
    * queries × corpus on band keys (never within-corpus pairs, never
    * all-pairs), and each candidate is exact-Jaccard verified in one
    * pass over the union of both sides' exploded shingles. This is the
    * fuzzy sibling of the exact n-gram contamination check: an eval
    * document paraphrased or lightly edited into the training set slips
    * past exact shingle hits but not past near-dup similarity.
    *
    * IDs must be DISJOINT across the two relations (the verify counts
    * a shingle seen from both members of a pair — a shared id would
    * alias them); the split-based caller satisfies this by
    * construction.
    *
    * Scale: signatures are one codegen'd HashAggregate per side; the
    * band join's big side is the corpus bands artifact (persistable,
    * bucketable — d10/d13's layout applies verbatim); the eval side is
    * tiny by definition. Shuffle volume tracks candidates, not the
    * corpus.
    */
  def crossMinhashPairs(corpus: DataFrame, queries: DataFrame,
      textCol: String, idCol: String, n: Int, k: Int, r: Int,
      threshold: Double): DataFrame = {
    require(k % r == 0, s"k=$k not divisible by band size r=$r")
    val exC = explodedShingles(corpus, textCol, idCol, n)
    val exQ = explodedShingles(queries, textCol, idCol, n)
    def sigsOf(ex: DataFrame): DataFrame = {
      val exH = ex.select(col("id"), baseHash(col("s")).as("h"))
      val aggs = (0 until k).map(i =>
        min(permuted(i, col("h"))).as(s"h$i")) :+ count(lit(1)).as("n_sh")
      exH.groupBy("id").agg(aggs.head, aggs.tail: _*)
    }
    val cand = bandedSigs(sigsOf(exQ), k, r).as("a")
      .join(bandedSigs(sigsOf(exC), k, r).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash"))
      .select(col("a.id").as("qid"), col("b.id").as("cid"),
        col("a.n_sh").as("nq"), col("b.n_sh").as("nc"))
      .distinct()
    val members = cand.select(
      struct(col("qid"), col("cid"), col("nq"), col("nc")).as("p"),
      explode(array(col("qid"), col("cid"))).as("id"))
    exQ.unionByName(exC).join(broadcast(members), "id")
      .groupBy(col("p"), col("s")).agg(count(lit(1)).as("sides"))
      .filter(col("sides") === 2)
      .groupBy("p").agg(count(lit(1)).as("c"))
      .select(col("p.qid").as("test_id"), col("p.cid").as("train_id"),
        (col("c").cast("double") / (col("p.nq") + col("p.nc") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures + shingle count per document:
    * `(id, h0..h{k-1}, n_sh)` — the persistable nightly sketch artifact
    * (k longs + a count ≈ 100 bytes/doc regardless of document size).
    * Same construction as [[minhashDupPairs]]'s internal pass: one base
    * hash per shingle, k primitive mins in a single codegen'd
    * HashAggregate. Documents with fewer than `n` tokens produce no row
    * (no shingles → nothing to sketch), matching the oracle's NULL-band
    * non-candidates.
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int): DataFrame = {
    val exH = explodedShingles(df, textCol, idCol, n)
      .select(col("id"), baseHash(col("s")).as("h"))
    val sigAggs = (0 until k).map(i =>
      min(permuted(i, col("h"))).as(s"h$i")) :+ count(lit(1)).as("n_sh")
    exH.groupBy("id").agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** Explode a [[minhashSignatures]] frame into LSH band rows
    * `(id, n_sh, band_idx, band_hash)` — the JOIN-READY form of the
    * signature artifact. Persist THIS layout (not the k-column sketch)
    * when the artifact feeds [[incrementalMinhashDupPairs]] nightly:
    * written `bucketBy(N, band_idx, band_hash)` (d10/d13's shape), the
    * history side of every future band join is exchange-free — the one
    * per-batch shuffle left is the (batch-sized) fresh side aligning to
    * the artifact's buckets. Derivation is a pure narrow map over vocab-
    * scale sketch rows, so rebanding after a config change is cheap;
    * the bucket count is a layout constant the artifact owns.
    */
  def bandedSignatures(sigs: DataFrame, k: Int, r: Int): DataFrame =
    bandedSigs(sigs, k, r)

  private def bandedSigs(sigs: DataFrame, k: Int, r: Int): DataFrame = {
    val bandArr = array((0 until k / r).map { j =>
      md5(concat_ws("|",
        (0 until r).map(i => col(s"h${j * r + i}").cast("string")): _*).cast("binary"))
    }: _*)
    sigs.select(col("id"), col("n_sh"),
      posexplode(bandArr).as(Seq("band_idx", "band_hash")))
  }

  /** Incremental NEAR-dup — [[incrementalDedup]]'s nightly shape lifted
    * from exact fingerprints to MinHash/LSH: label each fresh document
    * with the historical documents it near-duplicates (exact Jaccard ≥
    * threshold), emitting `(fresh_id, hist_id, jaccard)`.
    *
    * The 100 TB contract: HISTORY IS NEVER RE-SKETCHED. Pass the persisted
    * signature table ([[minhashSignatures]] output, appended nightly) as
    * `historySigs`; only the fresh batch is shingled and hashed, and the
    * candidate search is the same band equi-join as [[minhashDupPairs]]
    * but fresh×history instead of a self-join — shuffle volume tracks the
    * BATCH, not the corpus. History TEXT is touched only for verification,
    * and only the candidates' rows (semi-join pushdown before the shingle
    * explode), so the expensive relation scales with matches, not history.
    * Member rows are tagged with their side, so fresh and historical id
    * spaces may overlap safely.
    */
  def incrementalMinhashDupPairs(history: DataFrame, fresh: DataFrame,
      textCol: String, idCol: String, n: Int, k: Int, r: Int,
      threshold: Double, historySigs: Option[DataFrame] = None,
      historyBands: Option[DataFrame] = None): DataFrame = {
    require(k % r == 0, s"k=$k not divisible by band size r=$r")
    // preference order for the history side: a pre-banded artifact (the
    // bucketed [[bandedSignatures]] table — exchange-free join), else a
    // persisted k-column sketch (banded here, one narrow map), else —
    // the bootstrap case only — sketch the history text now
    val hBands = historyBands.getOrElse {
      val hSigs = historySigs.getOrElse(minhashSignatures(history, textCol, idCol, n, k))
      bandedSigs(hSigs, k, r)
    }
    val fSigs = minhashSignatures(fresh, textCol, idCol, n, k)
    val cand = bandedSigs(fSigs, k, r).as("f")
      .join(hBands.as("h"),
        col("f.band_idx") === col("h.band_idx") &&
        col("f.band_hash") === col("h.band_hash"))
      .select(col("f.id").as("fresh_id"), col("h.id").as("hist_id"),
        col("f.n_sh").as("n1"), col("h.n_sh").as("n2"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact verify over ONLY candidate members' shingles: one pass, sides
    // tagged, |A ∩ B| by counting shingles seen from both members
    val members = cand.select(
      struct(col("fresh_id"), col("hist_id"), col("n1"), col("n2")).as("p"),
      explode(array(
        struct(lit("f").as("side"), col("fresh_id").as("id")),
        struct(lit("h").as("side"), col("hist_id").as("id")))).as("m"))
      .select(col("p"), col("m.side").as("side"), col("m.id").as("id"))
    def needed(df: DataFrame, ids: DataFrame): DataFrame =
      df.join(ids, df(idCol) === ids("__cid"), "left_semi")
    val exF = explodedShingles(
        needed(fresh, cand.select(col("fresh_id").as("__cid")).distinct()),
        textCol, idCol, n)
      .withColumn("side", lit("f"))
    val exH = explodedShingles(
        needed(history, cand.select(col("hist_id").as("__cid")).distinct()),
        textCol, idCol, n)
      .withColumn("side", lit("h"))
    exF.union(exH).join(broadcast(members), Seq("side", "id"))
      .groupBy(col("p"), col("s")).agg(count(lit(1)).as("sides"))
      .filter(col("sides") === 2)
      .groupBy("p").agg(count(lit(1)).as("c"))
      .select(col("p.fresh_id").as("fresh_id"), col("p.hist_id").as("hist_id"),
        (col("c").cast("double") / (col("p.n1") + col("p.n2") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Partial-overlap near-dup candidates via winnowing fingerprints
    * ([[graft.expr.WinnowFps]] — MOSS-style local fingerprints: positional
    * n-gram hashes, min per sliding window of `w`): pairs sharing at least
    * `minShared` fingerprints. Whole-document sketches (MinHash/SimHash)
    * dilute a copied paragraph inside an otherwise-different document
    * below any global threshold; winnowing guarantees every shared run of
    * ≥ n+w−1 tokens surfaces a shared fingerprint. One narrow map for the
    * fingerprints, one equi-join shuffle on the fingerprint — same shape
    * and scale posture as the LSH band join (a hot fingerprint is already
    * evidence of shared content, and `minShared` prunes incidental
    * single-window collisions).
    */
  def winnowDupPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, w: Int, minShared: Long): DataFrame = {
    graft.expr.VecExpressions.register(df.sparkSession)
    val fps = df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("id"),
        explode(call_function("winnow_fps", col(textCol), lit(n), lit(w))).as("fp"))
    fps.as("a").join(fps.as("b"), col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** 16-bit SimHash over word tokens: h(tok) = first 4 hex chars of
    * md5(tok) as an int; bit j of the sketch is 1 iff
    * (#tokens with bit j set) − (#tokens with bit j clear) > 0.
    */
  def simhash16(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text),
      t => conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("int"))
    val bits = (0 until 16).map { j =>
      val ones = size(filter(hashes, h => h.bitwiseAND(lit(1 << j)) =!= 0))
      when(ones * 2 > size(hashes), lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** SimHash sketches as ONE native codegen'd call per document
    * ([[graft.expr.Simhash16]]: tokenize + per-token md5 + bit vote in a
    * tight loop) — a pure narrow map, zero shuffles. Two previous
    * formulations both failed at bench scale: the array-expression form
    * re-evaluated the token hash list once per bit reference (~33 folds
    * per row), and the exploded-token 16-sum aggregate put a shuffle
    * under the pairing self-join, whose auto-broadcast build then
    * re-executed the whole sketch pipeline as a separate job. Docs with
    * zero tokens (or null text) get sk = 0.
    *
    * `spread = true` repartitions the input to the session shuffle-
    * partition count first — the knob for parallelism-starved inputs
    * (the local-bench regime, where one 5k-doc parquet file would
    * otherwise sketch on one core). It defaults OFF: a 100 TB corpus
    * arrives in thousands of splits, and repartitioning there is a
    * gratuitous full shuffle of the raw text. (An earlier auto-detect via
    * `df.rdd.getNumPartitions` was dropped — it eagerly converts the plan
    * to an RDD per call and throws on streaming frames, making a pure
    * plan-builder action-ish.)
    */
  def simhashSketch(df: DataFrame, textCol: String, idCol: String,
      spread: Boolean = false): DataFrame = {
    graft.expr.VecExpressions.register(df.sparkSession)
    val wide = if (spread)
      df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    else df
    wide.select(col(idCol).as("id"),
      coalesce(call_function("simhash16", col(textCol)), lit(0)).as("sk"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist, via segment
    * blocking (the same pigeonhole trick as LSH banding): split the 16-bit
    * sketch into `segments` equal bit-segments — any pair within Hamming
    * distance ≤ segments − 1 must agree on at least one whole segment — so
    * candidates are the pairs sharing a (segment index, segment value)
    * key, verified by exact `bit_count(xor)`. LOSSLESS for
    * maxDist < segments (enforced), so results are identical to the
    * all-pairs form, but the join is an equi-join shuffled on the segment
    * key: no full-corpus broadcast, no quadratic nested loop. At
    * production sketch widths (64/128-bit) segment values are sparse and
    * buckets stay small; a 16-bit sketch is deliberately compact here so
    * the DuckDB oracle can replicate it bit-for-bit.
    */
  def simhashDupPairs(df: DataFrame, textCol: String, idCol: String, maxDist: Int,
      segments: Int = 4, spread: Boolean = false): DataFrame = {
    require(maxDist < segments,
      s"segment blocking is only lossless for maxDist < segments (got $maxDist >= $segments)")
    require(16 % segments == 0, s"16-bit sketch not divisible into $segments segments")
    val segBits = 16 / segments
    // persist the per-doc sketch (two ints per document — the same
    // bounded-artifact reasoning as the MinHash signature persist): the
    // segment self-join consumes it on both sides, and without this the
    // 2-md5-per-token sketch map re-runs per consumer
    val base = simhashSketch(df, textCol, idCol, spread)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val segs = base.select(col("id"), col("sk"),
      posexplode(array((0 until segments).map(j =>
        shiftright(col("sk"), j * segBits).bitwiseAND(lit((1 << segBits) - 1))): _*))
        .as(Seq("seg_idx", "seg_val")))
    // identical-sketch pairs collide on every segment → distinct AFTER the
    // cheap hamming filter (survivors are few; candidates never carry
    // vectors or text, just two ints)
    segs.as("a").join(segs.as("b"),
        col("a.seg_idx") === col("b.seg_idx") &&
        col("a.seg_val") === col("b.seg_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.sk").bitwiseXOR(col("b.sk"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Connected components over a dup-pair edge list — the step every
    * production dedup pipeline runs AFTER pairing ([[minhashDupPairs]] /
    * [[simhashDupPairs]] / [[cosineDupPairs]] emit PAIRS; keeping one doc
    * per duplicate GROUP needs the transitive closure: a~b, b~c ⇒ keep one
    * of {a,b,c}). Returns `(idCol, cluster_id)` with `cluster_id` = the
    * minimum id in each component — i.e. the canonical survivor — for
    * every node, including singletons.
    *
    * Algorithm: distributed min-label propagation (hash-to-min). Each
    * round every node takes the minimum label among itself and its
    * neighbors — one equi-join edges⋈labels plus one groupBy-min, both
    * partial-aggregable hash operations on the node id. Labels only ever
    * decrease, so `Σlabels` strictly decreases until fixpoint — the
    * convergence test is two scalar aggregates (exact DECIMAL(38) sums:
    * a LONG Σ could overflow at 100 TB id ranges and a double Σ could
    * miss a small change), never a row-level diff join.
    *
    * Scale shape: rounds = graph diameter. Dup-cluster graphs are
    * near-cliques by construction (LSH banding links most members
    * directly), so diameter stays small no matter the corpus size; for
    * adversarial long-chain graphs the known refinement is
    * large-star/small-star (Kiveris et al., O(log²~n) rounds) — same
    * join+min primitive, different edge rewriting. The symmetrized edge
    * list is hash-partitioned on `src` ONCE and persisted, so each round
    * shuffles only the label frame (2 longs per node).
    *
    * Each round's result is `localCheckpoint`ed (eager): a round's plan
    * references the previous round TWICE (join input + union input), so
    * without lineage truncation the logical tree doubles per round and
    * Catalyst re-analysis goes exponential — measured 53 s for a 7-round
    * 500-node run, 3 s with the checkpoint. Local checkpoints are
    * re-executor-loss-safe only as far as the cache replication; a
    * production run on preemptible workers should set a reliable
    * `sparkContext.setCheckpointDir` and swap in `checkpoint()` — same
    * shape, durable blocks.
    */
  def dupClusters(nodes: DataFrame, edges: DataFrame, idCol: String,
      srcCol: String = "src", dstCol: String = "dst",
      maxIters: Int = 50): DataFrame = {
    requireIntegralIds(nodes, edges, idCol, srcCol, dstCol)
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shuffleParts = nodes.sparkSession.sessionState.conf.numShufflePartitions
    val sym = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .repartition(shuffleParts, col("src")) // align with the per-round join key
      .persist(mem)
    var labels = nodes
      .select(col(idCol).cast("long").as("id"), col(idCol).cast("long").as("lbl"))
      .localCheckpoint(true)
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
    var prev = checksum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val next = labels.join(sym, labels("id") === sym("src"))
        .select(col("dst").as("id"), col("lbl"))
        .union(labels.select(col("id"), col("lbl")))
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val cur = checksum(next)
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels.unpersist()
      labels = next
      it += 1
    }
    sym.unpersist()
    require(converged || maxIters == 0,
      s"dupClusters did not converge in $maxIters rounds — graph diameter " +
        s"exceeds the bound; raise maxIters or use dupClustersStar")
    // edge endpoints absent from `nodes` participate in propagation (they
    // carry connectivity and can supply the component minimum) but emit no
    // output row — the same stray-endpoint contract as [[dupClustersStar]]
    labels.join(nodes.select(col(idCol).cast("long").as("id")), Seq("id"), "left_semi")
      .select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }

  /** Both CC implementations shuffle and compare ids as longs; a silent
    * `cast("long")` would turn non-numeric ids (e.g. the md5 fingerprints
    * other Dedup ops accept) into nulls under non-ANSI or runtime errors
    * under ANSI, corrupting components with no clear failure — so the id
    * columns are validated up front. Map string fingerprints to dense
    * long ids (e.g. `hash`/`monotonically_increasing_id` + a dim table)
    * before clustering.
    */
  private def requireIntegralIds(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def check(df: DataFrame, c: String, what: String): Unit = {
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"$what column '$c' must be integral (byte/short/int/long), got $dt; " +
          "map string fingerprints to dense long ids before clustering")
    }
    check(nodes, idCol, "node id")
    check(edges, srcCol, "edge src")
    check(edges, dstCol, "edge dst")
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR edge
    * rewriting (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", public MapReduce literature) — [[dupClusters]]'s
    * O(diameter)-round label propagation replaced by O(log² n) rounds:
    * the variant to reach for when the dup graph is NOT near-clique
    * (chained plagiarism, threaded re-posts, any long-path topology).
    *
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(Γ(u) ∪ {u}) — strictly-larger neighbors hop toward the
    *     minimum, halving long paths;
    *   - small-star(u): every neighbor v ≤ u (and u itself) attaches to
    *     m = min(Γ⁻(u) ∪ {u}) — local stars consolidate.
    *
    * Both steps preserve connectivity; the fixpoint is a star forest
    * rooted at each component's minimum id. Per round: two
    * partial-aggregable groupBy-mins and two equi-joins on the node id —
    * the same shuffle primitive as [[dupClusters]], O(|E|) rows per round
    * with no sorting. Round results are eagerly `localCheckpoint`ed for
    * the same exponential-lineage reason documented there; convergence is
    * an (edge-count, order-free hash-sum) checksum pair per cycle, two
    * scalar aggregates.
    *
    * Returns `(idCol, cluster_id)` for every node, singletons included —
    * same contract as [[dupClusters]] (spec-checked equal on shared
    * topologies; gate-checked against the recursive-CTE oracle).
    */
  def dupClustersStar(nodes: DataFrame, edges: DataFrame, idCol: String,
      srcCol: String = "src", dstCol: String = "dst",
      maxIters: Int = 30): DataFrame = {
    requireIntegralIds(nodes, edges, idCol, srcCol, dstCol)
    def canon(df: DataFrame): DataFrame =
      df.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = s.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      canon(s.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      // canonical storage is u < v, so the "neighbors ≤ center"
      // orientation is exactly the reversed edge list — no sym+filter
      val smaller = e.select(col("v").as("u"), col("u").as("v"))
      val m = smaller.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      canon(smaller.join(m, "u").select(col("v").as("a"), col("m").as("b"))
        .union(m.select(col("u").as("a"), col("m").as("b"))))
    }
    def checksum(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)).as("n"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h")).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .transform(canon)
      .localCheckpoint(true)
    var prev = checksum(e)
    var it = 0
    var converged = e.isEmpty
    while (!converged && it < maxIters) {
      // checkpoint BETWEEN the stars too: smallStar consumes its input
      // twice (reversed edges + the center-min aggregate), which would
      // otherwise recompute the whole largeStar join per cycle
      val next = smallStar(largeStar(e).localCheckpoint(true)).localCheckpoint(true)
      val cur = checksum(next)
      converged = cur == prev
      prev = cur
      e.unpersist()
      e = next
      it += 1
    }
    require(converged,
      s"dupClustersStar did not converge in $maxIters cycles")
    // fixpoint is a star forest (u = component min < v): every non-root
    // node appears as exactly one edge's v; roots and singletons fall
    // back to themselves
    nodes.select(col(idCol).cast("long").as("id"))
      .join(e.groupBy(col("v").as("id")).agg(min(col("u")).as("lbl")),
        Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("lbl"), col("id")).as("cluster_id"))
  }

  /** EXACT-substring span recovery — the distributed approximation of
    * suffix-array substring dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better": duplicated SPANS, not duplicated
    * documents, are what inflate memorization). Where [[winnowDupPairs]]
    * says "these two docs share ≥k fingerprints", this op returns the
    * actual shared runs: `(id1, id2, start1, start2, span_len)` — every
    * maximal exactly-matching token run of length ≥ `minLen` between any
    * two documents (1-based token offsets, id1 < id2).
    *
    * Algorithm: every position contributes its n-gram md5 anchor; anchors
    * equal across documents match on an alignment DIAGONAL
    * (`p2 − p1` constant along an exact run), and consecutive anchor
    * positions on one diagonal are grouped gaps-and-islands style
    * (`p1 − row_number()` is constant within a run) — a shared run of
    * L ≥ n tokens yields exactly L−n+1 consecutive anchors, so
    * `span_len = max(p1) − min(p1) + n` is exact. No candidate is
    * verified against text: equal md5 anchors at every covered position
    * ARE the verification.
    *
    * Scale shape: one narrow map to anchors (O(tokens) rows), one
    * equi-join shuffled on the anchor hash, one window per (pair, diag).
    * `n` is the selectivity knob — at n=8 natural-language n-grams are
    * near-unique, so anchor buckets stay tiny (the Zipf head lives at
    * n≤3). The residual hazard is BOILERPLATE: a license header or
    * template repeated across millions of documents is one anchor value
    * whose join bucket explodes quadratically. `maxAnchorOcc` is the
    * standard guard (suffix-array dedup tools discard high-frequency
    * substrings the same way): anchors occurring more than that many
    * times corpus-wide are dropped before the pairing join — the
    * frequency count is a whole-partition window over the anchor hash,
    * so it rides the SAME shuffle the self-join needs, no extra
    * exchange. A span covered only by capped anchors is boilerplate by
    * definition — [[winnowDupPairs]]/t8 are its detectors. At 100 TB the
    * other standard composition restricts the anchor join to candidate
    * pairs first (semi-join the ids [[winnowDupPairs]] or
    * [[minhashDupPairs]] surfaces, then span-recover) — same operator,
    * pre-filtered input.
    */
  def substringSpans(df: DataFrame, textCol: String, idCol: String,
      n: Int, minLen: Int, maxAnchorOcc: Int = 0): DataFrame = {
    require(n >= 2, s"anchor n-gram too short: $n")
    require(minLen >= n, s"minLen $minLen must be >= n=$n")
    import org.apache.spark.sql.expressions.Window
    val raw = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(col("tk")) - (n - 1)),
        p => md5(array_join(slice(col("tk"), p, lit(n)), " ").cast("binary"))))
        .as(Seq("p0", "h")))
      .select(col("id"), (col("p0") + 1).as("p"), col("h"))
    val grams =
      if (maxAnchorOcc <= 0) raw
      else raw
        .withColumn("__f", count(lit(1)).over(Window.partitionBy("h")))
        .filter(col("__f") <= maxAnchorOcc)
        .drop("__f")
    val m = grams.as("a").join(grams.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.p").as("p1"), (col("b.p") - col("a.p")).as("diag"))
    val w = Window.partitionBy("id1", "id2", "diag").orderBy("p1")
    m.withColumn("isl", col("p1") - row_number().over(w))
      .groupBy("id1", "id2", "diag", "isl")
      .agg(min(col("p1")).as("start1"), max(col("p1")).as("maxp1"))
      .select(col("id1"), col("id2"),
        col("start1").cast("long").as("start1"),
        (col("start1") + col("diag")).cast("long").as("start2"),
        (col("maxp1") - col("start1") + n).cast("long").as("span_len"))
      .filter(col("span_len") >= minLen)
  }

  /** Canonical-survivor selection — the policy step after clustering:
    * per cluster keep the member with the highest score (ties to the
    * SMALLEST id, so the choice is total); emits the cluster's keeper,
    * its score, and the member count — i.e. "which doc survives dedup,
    * and how many it replaces". The argmax is a single partial-aggregable
    * `max(struct(score, −id))` groupBy (the [[Similarity]] keep=1 argmin
    * pattern, flipped) — one hash shuffle of one row per cluster, no
    * window sort over members.
    *
    * @param labeled one row per (member, cluster) with an integral score
    *        (carry float scores as micro-units — the struct-max needs an
    *        exact total order to be engine-deterministic).
    */
  def canonicalPerCluster(labeled: DataFrame, idCol: String,
      clusterCol: String, scoreCol: String): DataFrame =
    labeled
      .select(col(clusterCol).as("cluster_id"),
        struct(col(scoreCol).cast("long").as("s"),
          (-col(idCol)).cast("long").as("nid")).as("cand"))
      .groupBy("cluster_id")
      .agg(max(col("cand")).as("best"), count(lit(1)).as("n_members"))
      .select(col("cluster_id"), (-col("best.nid")).as("kept_id"),
        col("best.s").as("kept_score"), col("n_members"))

  /** Soft-dedup training weights: instead of DROPPING duplicates, keep
    * every member and down-weight it by its cluster's multiplicity
    * (`w = 1/|cluster|`, micro-rounded) — the data-constrained regime's
    * alternative to hard dedup (repeating data has diminishing but
    * nonzero value; a hard drop throws the tail away, a soft weight
    * keeps it at calibrated influence). Total corpus influence equals
    * the deduped count by construction: Σ w = #clusters. Two
    * partial-aggregable shuffles on the cluster id (size count + the
    * member join), no window sort.
    *
    * @param clustered (member id, cluster id) — [[dupClusters]] output
    * @return (doc_id, cluster_id, cluster_size, weight_micro)
    */
  def softDedupWeights(clustered: DataFrame, idCol: String,
      clusterCol: String): DataFrame = {
    val sizes = clustered.groupBy(col(clusterCol).as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    clustered.select(col(idCol).as("doc_id"), col(clusterCol).as("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        round(lit(1e6) / col("cluster_size"), 0).cast("long").as("weight_micro"))
  }

  /** Near-duplicate pairs over BIT-STRING perceptual hashes (dHash /
    * pHash output — [[graft.ops.Multimodal.dhashImage]]'s 64-char
    * '0'/'1' form): the image twin of [[simhashDupPairs]]' pigeonhole.
    * Two hashes within `maxHamming` bits must agree EXACTLY on at least
    * one of `maxHamming + 1` equal segments, so candidates come from a
    * segment equi-join — never an all-pairs scan — and each candidate is
    * verified with the exact Hamming distance, computed per segment as
    * codegen'd `bit_count(xor(conv(seg, 2, 10)))` primitives (segments
    * are ≤ 16 bits, so the base-2 conv stays far from LONG wrap; a raw
    * 64-bit conv would overflow the signed cast on a high first bit).
    *
    * Scale: segment-bucket sizes follow the hash distribution the same
    * way LSH band buckets do — a 16-bit segment has 65k buckets, and
    * genuinely-popular segments mean genuinely-similar images (the thing
    * being hunted). The verify join touches candidates only.
    */
  def bitstringDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
      bits: Int, maxHamming: Int): DataFrame = {
    val nseg = maxHamming + 1
    require(maxHamming >= 0 && bits % nseg == 0,
      s"bits=$bits not divisible into ${nseg} segments")
    val segLen = bits / nseg
    // a segment wider than 62 bits overflows conv's signed-LONG output
    // (string→long cast nulls, hamming nulls, every pair SILENTLY
    // dropped) — e.g. bits=64 with maxHamming=0. Fail loudly instead;
    // the doc's pigeonhole math assumes ≤16-bit segments anyway.
    require(segLen <= 62,
      s"segment width $segLen bits (bits=$bits / ${nseg} segments) exceeds " +
        "62 — conv(seg, 2, 10) would overflow LONG and null every pair; " +
        "raise maxHamming so segments stay narrow")
    val h = hashes.select(col(idCol).cast("long").as("id"), col(hashCol).as("h"))
      .filter(col("h").isNotNull)
    val segs = h.select(col("id"), col("h"),
      posexplode(array((0 until nseg).map(s =>
        substring(col("h"), 1 + s * segLen, segLen)): _*)).as(Seq("seg_idx", "seg")))
    val cand = segs.as("a").join(segs.as("b"),
        col("a.seg_idx") === col("b.seg_idx") && col("a.seg") === col("b.seg") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.h").as("h1"), col("b.h").as("h2"))
      .distinct()
    val ham = (0 until nseg).map { s =>
      bit_count(conv(substring(col("h1"), 1 + s * segLen, segLen), 2, 10)
        .cast("long")
        .bitwiseXOR(conv(substring(col("h2"), 1 + s * segLen, segLen), 2, 10)
          .cast("long")))
    }.reduce(_ + _)
    cand.select(col("id1"), col("id2"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Quality-aware survivor selection — [[canonicalPerCluster]] with the
    * curation verdict ahead of the size score: per cluster keep the
    * member winning `(is_kept DESC, score DESC, id ASC)`, so dedup
    * retains the copy that PASSED the quality cascade, falling back to
    * the biggest member only among equals (a boilerplate-infested
    * near-dup of a clean page must lose to the clean page even when it
    * is longer). Same struct-max shape — one hash shuffle of one row per
    * member, no window sort — plus the kept-member count per cluster as
    * the audit column.
    *
    * @param labeled one row per (member, cluster) with a BOOLEAN
    *        `keptCol` and an integral `scoreCol`
    */
  def qualityCanonical(labeled: DataFrame, idCol: String, clusterCol: String,
      keptCol: String, scoreCol: String): DataFrame =
    labeled
      .select(col(clusterCol).as("cluster_id"),
        struct(col(keptCol).cast("long").as("k"),
          col(scoreCol).cast("long").as("s"),
          (-col(idCol)).cast("long").as("nid")).as("cand"),
        col(keptCol).cast("long").as("kept_flag"))
      .groupBy("cluster_id")
      .agg(max(col("cand")).as("best"), count(lit(1)).as("n_members"),
        sum(col("kept_flag")).as("n_kept_members"))
      .select(col("cluster_id"), (-col("best.nid")).as("kept_id"),
        (col("best.k") === 1L).as("kept_is_kept"),
        col("best.s").as("kept_score"),
        col("n_members"), col("n_kept_members"))

  /** Per-id prefix-block frame shared by [[editDistanceDupPairs]] and
    * [[editDistanceCapStats]]: (id, t, blk = md5 of the first `prefixLen`
    * chars, len, __bn = block population via a window count that rides
    * the block key's own shuffle).
    */
  private def editDistanceBlocked(df: DataFrame, textCol: String,
      idCol: String, prefixLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
      .filter(col("t").isNotNull)
      .select(col("id"), col("t"),
        md5(substring(col("t"), 1, prefixLen).cast("binary")).as("blk"),
        length(col("t")).as("len"))
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy("blk")))
  }

  /** Edit-distance-verified near-dup pairs: cheap blocking, expensive
    * exact verify — the ED-Join family's shape (prefix filtering + length
    * filter + banded Levenshtein), the right tool when "duplicate" means
    * "a few character edits apart" rather than "high shingle overlap".
    *
    * Blocking: md5 of the first `prefixLen` characters (fixed-width key
    * regardless of prefix size) — candidates must agree on the prefix, so
    * edits INSIDE the first `prefixLen` chars are invisible (documented
    * recall bound; run with two offset prefixes and union to tighten).
    * The length filter `|len(a) − len(b)| ≤ maxDist` is a true lower
    * bound on edit distance, applied inside the join condition.
    *
    * Verify uses Spark's threshold Levenshtein (`levenshtein(a, b, k)`:
    * banded O(k·n) DP that early-exits to −1 above k) — on verified-dup
    * corpora the band is what makes the verify affordable; distances are
    * exact integers, so cross-engine parity is free.
    *
    * Scale shape: one shuffle on the block key. A boilerplate prefix
    * ("click here to unsubscribe…") would square a block, so blocks
    * larger than `maxBlock` are dropped via a window count that rides the
    * pairing join's own shuffle (same guard as [[substringSpans]]'s
    * anchor cap) — mega-blocks are boilerplate detection's job, not
    * pairwise edit distance's. The cap is NOT silent: run
    * [[editDistanceCapStats]] with the same parameters to get the
    * dropped blocks and row counts (same one-aggregation price as the
    * blocking pass itself).
    */
  def editDistanceDupPairs(df: DataFrame, textCol: String, idCol: String,
      prefixLen: Int, maxDist: Int, maxBlock: Int = 64): DataFrame = {
    require(prefixLen >= 1 && maxDist >= 0, s"bad params $prefixLen/$maxDist")
    val capped = editDistanceBlocked(df, textCol, idCol, prefixLen)
      .filter(col("__bn") <= maxBlock).drop("__bn")
    capped.as("a").join(capped.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
        abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        levenshtein(col("a.t"), col("b.t"), maxDist).cast("long").as("edit_dist"))
      .filter(col("edit_dist") =!= -1L)
  }

  /** The blocks [[editDistanceDupPairs]] EXCLUDES under the same
    * parameters — the cap's audit trail (the "no silent caps" rule): one
    * row per over-`maxBlock` block with its population, so a pipeline
    * can alert on how much text the pairwise pass never saw and route
    * those blocks to boilerplate handling instead. Same plan shape as
    * the blocking pass (one window count on the block key); at any
    * scale the output is ≤ |corpus|/maxBlock rows.
    *
    * @return (blk, n_rows) for each dropped block, n_rows > maxBlock.
    */
  def editDistanceCapStats(df: DataFrame, textCol: String, idCol: String,
      prefixLen: Int, maxBlock: Int = 64): DataFrame = {
    require(prefixLen >= 1, s"bad prefixLen $prefixLen")
    editDistanceBlocked(df, textCol, idCol, prefixLen)
      .filter(col("__bn") > maxBlock)
      .groupBy(col("blk")).agg(count(lit(1)).as("n_rows"))
  }

  /** URL canonicalization — the FIRST dedup pass every web-corpus
    * pipeline runs (RefinedWeb/CCNet shape): the same page is crawled
    * under scheme-case, `www.`, default-port, duplicate-slash,
    * trailing-slash, tracking-parameter, query-order, and fragment
    * variants, and none of the content-level passes should ever see
    * those as distinct documents. Normalization rules, applied as ONE
    * narrow codegen'd string expression (zero shuffles, no UDF):
    * scheme and host lowercased; leading `www.` and explicit `:80`/
    * `:443` ports dropped; duplicate path slashes collapsed and
    * trailing slashes stripped (root path canonicalizes to the bare
    * host); tracking parameters (`utm_*`, `fbclid`, `gclid`, `ref`)
    * removed; surviving query parameters SORTED (byte order — query
    * order never carries meaning for dedup purposes); fragments
    * dropped. Deliberately NOT done: percent-decoding (decoding can
    * merge genuinely distinct resources, e.g. `%2F` in a path segment)
    * and IDN/punycode folding (needs a table, and mixed encodings are
    * rare enough to leave to the content passes).
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)),
        "^www\\.", ""),
      ":(80|443)$", "")
    val path = regexp_replace(
      regexp_replace(
        regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
        "/{2,}", "/"),
      "/+$", "")
    val qraw = regexp_extract(url, "\\?([^#]*)", 1)
    val prs = when(qraw === "", array().cast("array<string>"))
      .otherwise(split(qraw, "&"))
    val kept = filter(prs, x => !x.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))
    val q = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** URL-level dedup over [[canonicalUrl]]: per input row, the
    * canonical form, the group's surviving id (min — the usual
    * first-crawl-wins policy) and a dup flag. Scale shape: the
    * canonicalization is map-side; the reduction is one
    * partial-aggregable `min` per canonical key plus one
    * co-partitioned join back (both sides hash on the canonical
    * string — AQE coalesces; a viral mega-dup URL is a min-reduction,
    * combiner-friendly, never a skew hazard the way a windowed
    * `min over (partition by url)` row-sort would be).
    */
  def urlCanonicalDedup(df: DataFrame, urlCol: String,
      idCol: String): DataFrame = {
    val c = df.select(col(idCol).as("id"),
      canonicalUrl(col(urlCol)).as("canonical_url"))
    val keep = c.groupBy("canonical_url")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_variants"))
    c.join(keep, Seq("canonical_url"))
      .select(col("id"), col("canonical_url"), col("keep_id"),
        col("n_variants"), (col("id") =!= col("keep_id")).as("is_dup"))
  }

  /** ANALYTIC LSH parameter selection — the design-time complement of
    * the d25 empirical recall ladder: for every `(bands, rows)`
    * factorization of the signature length, the MinHash S-curve
    * `P(candidate | s) = 1 − (1 − s^r)^b` is evaluated on a similarity
    * grid, and each config is costed by its discrete false-positive
    * mass below the target threshold plus false-negative mass at/above
    * it — the standard banding-choice calculus (MMDS ch.3), emitted as
    * a gated frame so the parameter decision itself is auditable and
    * replayable instead of folklore. Pure closed-form arithmetic on a
    * grid × configs frame (rows = configs × grid points — constant);
    * the cheapest config is marked `chosen` (ties to more bands, the
    * recall-leaning default).
    *
    * @return per (bands, rows): (bands, rows, fp_cost, fn_cost, cost,
    *         chosen) — costs 6-rounded grid sums
    */
  def lshTuneBands(spark: org.apache.spark.sql.SparkSession, kSig: Int,
      thresholdMicro: Long, gridStepMicro: Long = 50000L): DataFrame = {
    require(kSig >= 2, s"signature length must be >= 2: $kSig")
    require(thresholdMicro > 0 && thresholdMicro < 1000000L,
      s"threshold out of (0, 1e6): $thresholdMicro")
    require(gridStepMicro > 0 && 1000000L % gridStepMicro == 0,
      s"grid step must divide 1e6: $gridStepMicro")
    import spark.implicits._
    val configs = (1 to kSig).filter(kSig % _ == 0)
      .map(b => (b, kSig / b))
    val grid = (gridStepMicro until 1000000L by gridStepMicro).toSeq
    val rows = for ((b, r) <- configs; sMicro <- grid) yield {
      val s = sMicro / 1e6
      val p = 1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
      (b.toLong, r.toLong, sMicro, p)
    }
    val curve = rows.toDF("bands", "rows", "s_micro", "p")
    val costs = curve.groupBy("bands", "rows")
      .agg(
        round(sum(when(col("s_micro") < thresholdMicro, col("p"))
          .otherwise(lit(0.0))), 6).as("fp_cost"),
        round(sum(when(col("s_micro") >= thresholdMicro, lit(1.0) - col("p"))
          .otherwise(lit(0.0))), 6).as("fn_cost"))
      .withColumn("cost", round(col("fp_cost") + col("fn_cost"), 6))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cost"), col("bands").desc) // configs-sized
    costs.withColumn("chosen", row_number().over(w) === 1)
      .select(col("bands"), col("rows"), col("fp_cost"), col("fn_cost"),
        col("cost"), col("chosen"))
  }

  /** MULTI-PASS blocked RECORD LINKAGE — entity resolution over
    * structured records, the field-aware sibling of the text dedup
    * family: candidate pairs come from the union of several cheap
    * BLOCKING passes (each an equi-join on a blocking key plus the
    * must-match exact columns — never an all-pairs scan), and each
    * candidate is verified with the exact Levenshtein distance on the
    * name field. Multiple passes are the recall story: a single
    * blocking key is brittle against typos that mutate it (a dropped
    * first character kills a prefix block), so production linkage runs
    * complementary passes — e.g. name-prefix AND name-suffix — and a
    * typo must break EVERY pass's key to escape (the pigeonhole
    * argument [[bitstringDupPairs]] makes for Hamming, applied to
    * blocking). Pairs surfacing in several passes emit once.
    *
    * Scale shape: each pass is an equi-join shuffled on
    * `(pass, block-key, exact cols)`; block populations bound each
    * bucket, the verify join touches candidates only, and the distinct
    * is over the candidate-pair space — the standard Fellegi-Sunter
    * pipeline skeleton with the probabilistic weights replaced by an
    * exact distance gate (deterministic, cross-engine replayable).
    *
    * @param blockPasses one Column per pass, evaluated against the
    *        record frame (e.g. `substring(col("name"), 1, 2)`,
    *        `substring(col("name"), -2, 2)`)
    * @return (id1, id2, edit_dist) — id1 < id2, dist ≤ maxEditDist
    */
  def linkagePairs(records: DataFrame, idCol: String, nameCol: String,
      exactCols: Seq[String], blockPasses: Seq[org.apache.spark.sql.Column],
      maxEditDist: Int): DataFrame = {
    require(blockPasses.nonEmpty, "at least one blocking pass required")
    require(maxEditDist >= 0, s"maxEditDist must be >= 0: $maxEditDist")
    val passes = blockPasses.zipWithIndex.map { case (bk, i) =>
      records.select(Seq(col(idCol).cast("long").as("id"),
          col(nameCol).as("nm"), bk.cast("string").as("bk")) ++
          exactCols.map(c => col(c).as(s"x_$c")): _*)
        .withColumn("pass", lit(i))
    }.reduce(_ unionByName _)
    val joinCond = col("a.pass") === col("b.pass") &&
      col("a.bk") === col("b.bk") && col("a.id") < col("b.id") &&
      exactCols.map(c => col(s"a.x_$c") === col(s"b.x_$c"))
        .foldLeft(lit(true))(_ && _)
    passes.as("a").join(passes.as("b"), joinCond)
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.nm").as("nm1"), col("b.nm").as("nm2"))
      .distinct() // a pair sharing several pass-blocks surfaces once
      .select(col("id1"), col("id2"),
        levenshtein(col("nm1"), col("nm2")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxEditDist)
  }
}
