package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingestion and training: cross-split contamination detection, PII
  * detection/redaction, and repetition (boilerplate) metrics.
  *
  * Scale posture (100 TB): PII and repetition are pure narrow maps —
  * codegen'd regex/array expressions, zero shuffles, zero state.
  * Contamination is the one wide op: it shuffles on the n-gram itself
  * (the standard decontamination shape — e.g. the 13-gram overlap checks
  * used for LLM eval-set hygiene), with the train-side n-gram set
  * de-duplicated map-side before the join. No driver-side collection
  * anywhere.
  */
object Curation {

  /** Cross-split contamination: for every document in `test`, how many of
    * its word n-gram shingles appear in ANY `train` document.
    *
    * Returns one row per test document:
    * `(id, n_shingles, n_hit, contamination)` where `contamination` =
    * n_hit / n_shingles (0.0 for docs with fewer than `n` tokens).
    *
    * Plan shape: both sides tokenize+shingle map-side with the native
    * [[graft.expr.WordShingles]] kernel; the train shingle universe is
    * `distinct()` (one shuffle, map-side partial dedup) and the test
    * shingles equi-join it on the shingle string (second shuffle). Per-doc
    * shingle counts ride the test rows — no second pass over the corpus.
    * A hot shingle is bounded by the train-side dedup: each distinct
    * shingle joins once per test occurrence, never train×test.
    */
  def contamination(train: DataFrame, test: DataFrame, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val trainShingles = Dedup.explodedShingles(train, textCol, idCol, n)
      .select(col("s")).distinct()
    val testEx = Dedup.explodedShingles(test, textCol, idCol, n)
    // WordShingles emits DISTINCT shingles per doc, so this count is
    // "distinct shingles of this test doc seen anywhere in train"
    val hits = testEx.join(trainShingles, "s")
      .groupBy("id").agg(count(lit(1)).as("n_hit"))
    graft.expr.VecExpressions.register(test.sparkSession)
    val sizes = test.select(col(idCol).as("id"),
      size(call_function("word_shingles", col(textCol), lit(n))).as("n_shingles"))
    sizes.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_shingles").cast("long").as("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(when(col("n_shingles") === 0, lit(0.0))
          .otherwise(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_shingles")), 6)
          .as("contamination"))
  }

  /** PII patterns — deliberately simple and RE2-compatible so any engine
    * (including the DuckDB oracle) matches byte-for-byte. Production
    * gazetteers go further (names, addresses); the *engine shape* — a
    * codegen'd regex scan per pattern, fused into one projection — is
    * what matters at scale.
    */
  val EmailPattern = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
  val Ipv4Pattern = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"

  /** Per-document PII counts: `(n_emails, n_ips)` appended as columns. */
  def piiStats(df: DataFrame, textCol: String): DataFrame =
    // group index 0 = whole match (the patterns define no capture groups;
    // Spark's default idx is 1, which would throw here)
    df.withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0))))

  /** Redact PII in place: emails → `[EMAIL]`, then IPv4s → `[IP]`
    * (order matters — the email replacement must not destroy the digit
    * runs an IP match needs, so emails go first by construction of the
    * patterns: they cannot overlap an IPv4).
    */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "[EMAIL]"), Ipv4Pattern, "[IP]")

  /** Fixed-size token chunking with overlap — the splitter in front of
    * embedding generation / RAG indexing: chunk k covers tokens
    * `[k·stride + 1, k·stride + size]`, chunks are emitted until the
    * first one whose window reaches the document's end (count =
    * `1 + ⌈max(0, len − size) / stride⌉`, all-integer arithmetic), and
    * the final chunk may be short. `stride < size` gives the overlap
    * that keeps boundary-spanning content retrievable. Pure narrow map +
    * explode — one output row per (doc, chunk), no shuffle; empty docs
    * emit nothing.
    */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"bad chunking params: size=$chunkSize stride=$stride")
    // (len − size + stride − 1) ÷ stride: Column `/` is double division;
    // the floor-cast equals integer division for these non-negatives
    def nChunks(tk: Column): Column =
      lit(1) + ((greatest(lit(0), size(tk) - chunkSize) + (stride - 1))
        / stride).cast("int")
    df.select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("id"), col("tk"),
        explode(sequence(lit(0), nChunks(col("tk")) - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(col("tk"), col("chunk_idx") * stride + 1, lit(chunkSize)).as("chunk"))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_md5"))
  }

  /** Unigram language-model surprisal — the distributional quality score
    * (the in-engine analogue of the KenLM-perplexity filters in
    * CCNet-style curation: a document whose vocabulary is improbable
    * under the corpus model scores high; production swaps in a real LM,
    * the pipeline shape is identical). The model is trained on the corpus
    * itself in the same pass: `p(t) = count(t) / Σcounts`, doc score =
    * mean per-token surprisal `−ln p(t)`.
    *
    * Engine-exact discipline (the [[Similarity.groupCentroids]]
    * fixed-point rule applied to floats that must cross a shuffle):
    * per-token surprisal is rounded to integer MICRO-nats immediately
    * after the `ln` (absorbing the ≤1-ulp cross-engine `ln` wobble, as
    * t5's idf does), summed as LONGs (order-free — a double sum's low
    * bits depend on shuffle arrival order), divided once at emit.
    *
    * Plan shape: one tokenize pass feeds the vocabulary aggregate and the
    * doc join; vocabulary is the compact artifact (|vocab| rows) that at
    * 100 TB would persist as a table. The corpus-side token join keys on
    * raw token — Zipf head words are mega-keys under a shuffle join, so
    * the vocab side carries an EXPLICIT `broadcast()` hint (never rely on
    * the 10 MB auto threshold: a web-scale vocab can exceed it and fall
    * back to a skewed sort-merge join silently; if the vocab genuinely
    * outgrows broadcast, salt it k-ways as in [[SkewJoin]]). Docs with
    * zero tokens emit no row (no distribution to score against).
    */
  def unigramSurprisal(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("n"))
    val sup = vocab.crossJoin(broadcast(total))
      .select(col("t"),
        round(-log(col("c").cast("double") / col("n")) * 1e6, 0)
          .cast("long").as("s_micro"))
    tok.join(broadcast(sup), "t")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_micro")).as("ssum"))
      .select(col("id"), col("n_tokens"),
        round(col("ssum").cast("double") / col("n_tokens") / 1e6, 6).as("surprisal"))
  }

  /** Windowed skip-gram co-occurrence counts — word2vec-style context
    * pair extraction generalizing [[pmiCollocations]]' adjacent bigrams
    * to offsets 1..`window` (ordered pairs: `(w_i, w_{i+o})`). The
    * extraction is NARROW — one `zip_with` of two slices per offset, no
    * positional self-join (the naive position-explode + range-join
    * formulation shuffles the corpus once per document token and skews on
    * Zipf heads; the slice form never shuffles until the final count).
    * One partial-aggregable count + `TakeOrderedAndProject` top-k.
    */
  def skipgramCounts(df: DataFrame, textCol: String, window: Int,
      minCount: Long, k: Int): DataFrame = {
    require(window >= 1 && window <= 16, s"bad window $window")
    val toks = TextFunctions.tokens(col(textCol))
    val pairs = (1 to window).map { o =>
      df.select(toks.as("tk")).filter(size(col("tk")) > o)
        .select(explode(zip_with(
          slice(col("tk"), lit(1), size(col("tk")) - o),
          slice(col("tk"), lit(o + 1), size(col("tk")) - o),
          (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
    }.reduce(_ unionByName _)
    pairs.select(col("p.ta").as("ta"), col("p.tb").as("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .orderBy(desc("n"), col("ta"), col("tb"))
      .limit(k)
  }

  /** Interpolated bigram-LM surprisal — the next LM rung above
    * [[unigramSurprisal]] and the classic cheap perplexity filter for
    * pretraining corpora: score each document by
    * `−mean ln p(w_i | w_{i−1})` under
    * `p(b|a) = λ·c(ab)/c(a) + (1−λ)·c(b)/N` (interpolation, so unseen
    * continuations still get the unigram floor and no ln(0) exists —
    * every observed bigram's backoff term is positive).
    *
    * Engine parity: the probability is assembled in the DOUBLE domain in
    * a fixed operation order — `(λµ·c_ab/c_a + (1e6−λµ)·c_b/N) / 1e6`
    * with λ carried as integer micro-units (both engines parse the same
    * literals; a bare `0.7` would be DECIMAL in DuckDB) — then ONE ln,
    * micro-nat-rounded immediately ([[unigramSurprisal]]'s fixed-point
    * rule), LONG-summed order-free, divided once at emit.
    *
    * Plan shape: one tokenize pass makes the unigram vocab; one
    * bigram-explode pass (persisted) feeds BOTH the bigram-count
    * aggregate and the per-position scoring join. Vocab and scored-bigram
    * tables carry explicit `broadcast()` hints — same Zipf-skew posture
    * as [[pmiCollocations]]; a corpus whose OBSERVED-bigram table
    * outgrows broadcast salts the scoring join k-ways instead
    * ([[SkewJoin]]'s shape).
    */
  def bigramSurprisal(df: DataFrame, textCol: String, idCol: String,
      lambdaMicro: Long = 700000L): DataFrame = {
    require(lambdaMicro > 0 && lambdaMicro < 1000000L, s"bad lambda $lambdaMicro")
    val toks = TextFunctions.tokens(col(textCol))
    val tok = df.select(explode(toks).as("t"))
    val uni = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val nTok = uni.agg(sum(col("c")).as("n"))
    val pos = df.select(col(idCol).as("id"), toks.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("id"), col("p.ta").as("ta"), col("p.tb").as("tb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bcnt = pos.groupBy("ta", "tb").agg(count(lit(1)).as("c_ab"))
    val scored = bcnt
      .join(broadcast(uni.select(col("t").as("ta"), col("c").as("c_a"))), "ta")
      .join(broadcast(uni.select(col("t").as("tb"), col("c").as("c_b"))), "tb")
      .crossJoin(broadcast(nTok))
      .select(col("ta"), col("tb"),
        round(-log(
          (lit(lambdaMicro.toDouble) * col("c_ab") / col("c_a")
            + lit((1000000L - lambdaMicro).toDouble) * col("c_b") / col("n"))
            / lit(1000000.0)) * 1e6, 0).cast("long").as("s_micro"))
    pos.join(broadcast(scored), Seq("ta", "tb"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s_micro")).as("ssum"))
      .select(col("id"), col("n_bigrams"),
        round(col("ssum").cast("double") / col("n_bigrams") / 1e6, 6).as("surprisal"))
  }

  /** Kneser–Ney-interpolated bigram surprisal — the top LM rung above
    * [[bigramSurprisal]] and the smoothing the production perplexity
    * filters (CCNet-style KenLM gating) actually use: score each doc by
    * `−mean ln p_KN(w_i | w_{i−1})` under absolute discounting with a
    * continuation-probability backoff,
    * `p_KN(b|a) = (c(ab) − D)/c(a) + D·N1+(a·)/c(a) · N1+(·b)/T`,
    * where `c(a) = Σ_b c(ab)` (bigram-table left marginal — the standard
    * KN normalizer, NOT the raw unigram count: it differs at document
    * boundaries and only the marginal makes the distribution sum to 1),
    * `N1+(a·)` / `N1+(·b)` are distinct-continuation / distinct-context
    * type counts, and `T` is the total observed-bigram type count. KN's
    * insight over plain interpolation: the backoff weight of a word is
    * how many CONTEXTS it completes ("Francisco" is frequent but follows
    * only "San" — its continuation probability is tiny, so boilerplate
    * n-grams stop masquerading as fluent text). In-corpus scoring means
    * every scored bigram is observed, so with `0 < D < 1` the discounted
    * term is positive and no ln(0) exists.
    *
    * Engine parity: every count is an exact LONG from one aggregate;
    * the probability is assembled in the DOUBLE domain in a fixed
    * operation order — `((c_ab − Dµ/1e6) + Dµ/1e6 · n1p_a · n1p_b / T)
    * / c_a` with the discount carried as integer micro-units (`Dµ/1e6`
    * constant-folds to the SAME exactly-representable double in both
    * engines for the 0.75 default; a bare `0.75` literal would be
    * DECIMAL in DuckDB) — then ONE ln, micro-nat-rounded immediately
    * ([[unigramSurprisal]]'s fixed-point rule), LONG-summed order-free,
    * divided once at emit. The `n1p_a·n1p_b` double product is bounded
    * by vocab² ≈ 10¹⁴ — inside the 2⁵³ exact-integer window even
    * web-scale.
    *
    * Plan shape: ONE bigram-explode pass (persisted) feeds the type
    * table; all three KN statistics (left marginal + continuation
    * types, context types, total types) are vocab-sized aggregates OVER
    * the type table, broadcast back onto it; the per-position scoring
    * join broadcasts the scored-bigram table — same Zipf-skew posture
    * as [[bigramSurprisal]] (shuffling position rows on raw bigram keys
    * mega-skews on "of the"; broadcasting the vocab-bounded scored side
    * keeps the corpus-sized side shuffle-free). A corpus whose
    * observed-bigram table outgrows broadcast salts the scoring join
    * k-ways instead ([[SkewJoin]]'s shape).
    */
  def knSurprisal(df: DataFrame, textCol: String, idCol: String,
      discountMicro: Long = 750000L): DataFrame = {
    require(discountMicro > 0 && discountMicro < 1000000L,
      s"bad discount $discountMicro")
    val toks = TextFunctions.tokens(col(textCol))
    val pos = df.select(col(idCol).as("id"), toks.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("id"), col("p.ta").as("ta"), col("p.tb").as("tb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bcnt = pos.groupBy("ta", "tb").agg(count(lit(1)).as("c_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val left = bcnt.groupBy("ta")
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1p_a"))
    val right = bcnt.groupBy("tb").agg(count(lit(1)).as("n1p_b"))
    val total = bcnt.agg(count(lit(1)).as("tt"))
    val d = lit(discountMicro.toDouble) / lit(1000000.0)
    val scored = bcnt
      .join(broadcast(left), "ta")
      .join(broadcast(right), "tb")
      .crossJoin(broadcast(total))
      .select(col("ta"), col("tb"),
        round(-log(
          ((col("c_ab").cast("double") - d)
            + d * col("n1p_a") * col("n1p_b") / col("tt"))
            / col("c_a")) * 1e6, 0).cast("long").as("s_micro"))
    pos.join(broadcast(scored), Seq("ta", "tb"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s_micro")).as("ssum"))
      .select(col("id"), col("n_bigrams"),
        round(col("ssum").cast("double") / col("n_bigrams") / 1e6, 6)
          .as("kn_surprisal"))
  }

  /** Cumulative lift/gain table — [[calibrationBins]]' decision-making
    * companion and the fourth leg of the model-eval family (AUC ranks,
    * calibration prices, confusion localizes, LIFT answers "how much
    * better than random is keeping only the top X%?"): bins ordered
    * top-score-down, each row carrying the cumulative capture rate
    * (share of all positives above the bin floor) and the lift of that
    * cut versus the base rate — the table a curation pipeline reads to
    * pick its quality threshold.
    *
    * Exactness: per-bin counts are one partial-aggregable pass; the
    * cumulative sums run over ≤ `bins` rows (a bins-sized window, never
    * corpus-sized); capture and lift are each ONE fixed-order double
    * formula over exact LONGs, 6-rounded — `(cum_pos/cum_n)/(pt/nt)`
    * with all four operands exact. Lift is NULL when the corpus has no
    * positives (undefined, not 0 — [[binaryAuc]]'s convention).
    */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bins >= 2, s"bins must be >= 2: $bins")
    val per = df.select(
        least(floor(col(scoreCol) * bins).cast("long"), lit(bins - 1L)).as("bin"),
        col(labelCol).cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val tot = per.agg(sum(col("n")).as("nt"), sum(col("n_pos")).as("pt"))
    val w = Window.orderBy(desc("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"), col("cum_n"), col("cum_pos"),
        when(col("pt") === 0, lit(null))
          .otherwise(round(col("cum_pos").cast("double") / col("pt").cast("double"), 6))
          .as("capture"),
        when(col("pt") === 0, lit(null))
          .otherwise(round(
            (col("cum_pos").cast("double") / col("cum_n").cast("double"))
              / (col("pt").cast("double") / col("nt").cast("double")), 6))
          .as("lift"))
  }

  /** Zipf-law fit over the top-`topN` vocabulary — the corpus-health
    * audit the token-level screens assume but never check: natural text
    * has log-frequency falling ~linearly in log-rank with slope ≈ −1;
    * machine-generated spam, template farms, and truncated/corrupted
    * decodes bend or flatten the curve. One OLS line
    * `ln c ~ slope·ln rank + intercept` plus R² — three scalars a drift
    * gate can hold across corpus versions.
    *
    * Exactness: ranks come from a TakeOrderedAndProject top-N (never a
    * corpus sort); `ln rank` / `ln count` are micro-nat-rounded LONGs
    * ([[unigramSurprisal]]'s fixed-point rule — the ONLY doubles before
    * the emit line), and all five OLS moments are exact DECIMAL(38,0)
    * sums (`N·Σxy` alone passes 2⁶³ at micro scale). Slope, intercept
    * and R² are each ONE closed-form ratio of exact integers —
    * `(NΣxy−ΣxΣy)/(NΣx²−(Σx)²)`, `(ΣyΣx²−ΣxΣxy)/(NΣx²−(Σx)²)` (µ-scale
    * divided out at emit), `(NΣxy−ΣxΣy)²/((NΣx²−(Σx)²)(NΣy²−(Σy)²))` —
    * 6-rounded, bit-replayable in SQL.
    *
    * Scale shape: one partial-aggregable vocab count, one top-N
    * (per-partition partial top-k), moments over N rows. Driver sees
    * one row.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 3, s"topN must be >= 3: $topN")
    val vocab = df.select(explode(TextFunctions.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("t")).limit(topN)
    val ranked = vocab.withColumn("rk",
      row_number().over(Window.orderBy(desc("c"), col("t"))))
    val pts = ranked.select(
      round(log(col("rk")) * 1e6, 0).cast("long").as("x"),
      round(log(col("c")) * 1e6, 0).cast("long").as("y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val m = pts.agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x")) * col("y")).as("sxy"),
      sum(dec(col("x")) * col("x")).as("sxx"),
      sum(dec(col("y")) * col("y")).as("syy"))
    val nD = dec(col("n"))
    val num = nD * col("sxy") - col("sx") * col("sy")
    val den = nD * col("sxx") - col("sx") * col("sx")
    val deny = nD * col("syy") - col("sy") * col("sy")
    val inum = col("sy") * col("sxx") - col("sx") * col("sxy")
    // den > 0 always (ranks are distinct and topN >= 3); deny = 0 iff
    // every count is identical — a degenerate flat "law", R² := 0
    m.select(col("n").as("n_terms"),
      round(num.cast("double") / den.cast("double"), 6).as("slope"),
      round(inum.cast("double") / den.cast("double") / 1e6, 6).as("intercept"),
      when(deny === 0, lit(0.0)).otherwise(
        round(num.cast("double") * num.cast("double")
          / (den.cast("double") * deny.cast("double")), 6)).as("r2"))
  }

  /** Top-k adjacent-token collocations by pointwise mutual information —
    * phrase mining over the corpus (multi-word entities, idioms,
    * domain terms): `pmi(a,b) = ln(p(a,b) / (p(a)·p(b)))` over raw
    * occurrence counts (NOT per-doc-distinct shingles — PMI needs true
    * frequencies), thresholded at `minCount` to kill one-off pairings.
    *
    * Engine parity: the ln argument is assembled in the DOUBLE domain as
    * an overflow-free product of three ratios
    * `(c_ab/N_bi) · (N_tok/c_a) · (N_tok/c_b)` — each factor is a
    * count ratio bounded far below double overflow, so the expression is
    * safe at ANY corpus size (the former integer form `c_ab·N_tok²`
    * overflows 2⁶³ beyond ~10⁹ tokens: ANSI mode throws, non-ANSI wraps
    * silently). Both engines evaluate the identical IEEE ops in the
    * identical order, then one `ln`, rounded to 6 decimals before
    * ranking, ties broken by the bigram string. The global top-k runs as
    * orderBy+limit — Catalyst plans TakeOrderedAndProject (per-partition
    * partial top-k), never a single-partition window sort.
    *
    * Skew posture: the two unigram joins key the (minCount-filtered)
    * bigram table on raw token — Zipf head words ("the") are mega-keys
    * under a shuffle join. The vocab side is broadcast explicitly (a
    * unigram vocab is compact — ~10⁷ rows even web-scale; if a corpus
    * ever exceeds the broadcast ceiling the fallback is salting the
    * vocab side k-ways, same shape as [[SkewJoin]]).
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val tok = df.select(explode(toks).as("t"))
    val uni = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val nTok = uni.agg(sum(col("c")).as("n_tok"))
    val bigrams = df.select(toks.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("p.ta").as("ta"), col("p.tb").as("tb"))
    val bcnt = bigrams.groupBy("ta", "tb").agg(count(lit(1)).as("c_ab"))
    val nBi = bcnt.agg(sum(col("c_ab")).as("n_bi"))
    bcnt.filter(col("c_ab") >= minCount)
      .join(broadcast(uni.select(col("t").as("ta"), col("c").as("c_a"))), "ta")
      .join(broadcast(uni.select(col("t").as("tb"), col("c").as("c_b"))), "tb")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .select(concat_ws(" ", col("ta"), col("tb")).as("bigram"),
        col("c_ab").as("n_pair"),
        round(log((col("c_ab").cast("double") / col("n_bi"))
          * (col("n_tok").cast("double") / col("c_a"))
          * (col("n_tok").cast("double") / col("c_b"))), 6).as("pmi"))
      .orderBy(desc("pmi"), col("bigram"))
      .limit(k)
  }

  /** TRAINED quality classifier — the fastText-style supervised filter of
    * the curation literature (a linear model over hashed bag-of-tokens
    * features; CCNet/GPT-3-style pipelines train exactly this shape to
    * score "reference-like" text): logistic regression on
    * [[Similarity.embedText]]'s hashing-trick features, trained by
    * full-batch gradient descent for `iters` iterations at rate `lr`,
    * returning the weight vector in integer MICRO units.
    *
    * Distributed shape (the [[Similarity.trainCentroids]] contract): per
    * iteration ONE aggregate over the corpus — margins are computed
    * map-side against the broadcast (literal) weight vector, residuals
    * explode to (dimension, resid·x) and collapse in a
    * partial-aggregable groupBy — and only `dim` aggregate rows ever
    * reach the driver. Runs unchanged at 100 TB.
    *
    * Engine-exact discipline (every float crossing a shuffle is integer):
    * features and weights are micro-LONGs, so the margin
    * `z = Σ wᵐ·xᵐ / 10¹²` is an EXACT order-free integer sum; the
    * sigmoid is the one libm call, its output micro-rounded immediately
    * (absorbing cross-engine `exp` ulps, the t14 `ln` rule); gradient
    * sums run in DECIMAL(38) (exact at any corpus size — resid·x ≤ 10¹²
    * per row, so a LONG Σ would overflow near 10⁷ docs); the weight
    * update is computed in double from those exact integers and
    * re-rounded to micro. Two runs — or two engines — produce
    * bit-identical weights (gated: t18 replays both iterations in SQL).
    */
  def trainTextClassifier(df: DataFrame, textCol: String, labelCol: String,
      dim: Int, iters: Int, lr: Double): Array[Long] = {
    require(iters >= 0 && lr > 0, s"bad training params: iters=$iters lr=$lr")
    graft.expr.VecExpressions.register(df.sparkSession)
    val base = df.select(
        (col(labelCol).cast("double") * 1e6).cast("long").as("ym"),
        transform(
          coalesce(call_function("hashed_embed", col(textCol), lit(dim)),
            array_repeat(lit(0f), dim)),
          x => round(x.cast("double") * 1e6, 0).cast("long")).as("xm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    require(n > 0, "empty training corpus")
    var wm = Array.fill(dim)(0L)
    for (_ <- 0 until iters) {
      val wmLit = typedlit(wm.toSeq)
      val zMicro2 = aggregate(
        zip_with(col("xm"), wmLit, (x, w) => x * w), lit(0L), (a, b) => a + b)
      val pm = round(
        lit(1.0) / (lit(1.0) + exp(-(zMicro2.cast("double") / 1e12))) * 1e6, 0)
        .cast("long")
      val sums = base.select((pm - col("ym")).as("r"),
          posexplode(col("xm")).as(Seq("j", "x")))
        .groupBy("j")
        .agg(sum((col("r") * col("x")).cast("decimal(38,0)")).as("s"))
        .collect()
      val next = wm.clone()
      sums.foreach { row =>
        val j = row.getInt(0)
        val sd = row.getDecimal(1).doubleValue()
        next(j) = math.rint(wm(j) - lr * sd / (n * 1e6)).toLong
      }
      wm = next
    }
    base.unpersist()
    wm
  }

  /** TRAINED one-vs-rest language-ID — the multi-class generalization of
    * [[trainTextClassifier]] (fastText-style supervised langid: one
    * logistic regression per language over the same hashed bag-of-tokens
    * features), trained for ALL classes in lockstep. Where per-class
    * training would scan the corpus `classes × iters` times, here each GD
    * iteration is ONE corpus pass: the per-class weight vectors travel as
    * a single broadcast `Map(class → weights)` literal, each cached
    * feature row fans out to its `classes` residuals map-side, and one
    * partial-aggregable groupBy over `(class, dimension)` collapses every
    * gradient — `classes·dim` aggregate rows reach the driver per
    * iteration, never corpus rows. The marker-voting [[TextFunctions
    * .langId]] heuristic stays the zero-training default; this is the
    * trained path that also covers languages with no marker set (e.g. the
    * fixture's `zh`).
    *
    * Arithmetic is per-class IDENTICAL to [[trainTextClassifier]] (micro
    * LONG margins, micro-rounded sigmoid, DECIMAL(38) gradient sums, the
    * same rounded double weight update), so the SQL oracle replays each
    * class independently with the t18 iteration block and the lockstep
    * training is bit-equal to `classes` separate runs.
    *
    * @param classes distinct label values, ascending (the argmax
    *        precedence order [[predictLangOneVsRest]] uses).
    * @return (class, micro-weights) in `classes` order.
    */
  def trainOneVsRestClassifiers(df: DataFrame, textCol: String, labelCol: String,
      classes: Seq[String], dim: Int, iters: Int, lr: Double): Seq[(String, Array[Long])] = {
    require(classes.nonEmpty && classes == classes.sorted && classes.distinct == classes,
      s"classes must be distinct and ascending: $classes")
    require(iters >= 0 && lr > 0, s"bad training params: iters=$iters lr=$lr")
    graft.expr.VecExpressions.register(df.sparkSession)
    val base = df.select(col(labelCol).cast("string").as("lab"),
        transform(
          coalesce(call_function("hashed_embed", col(textCol), lit(dim)),
            array_repeat(lit(0f), dim)),
          x => round(x.cast("double") * 1e6, 0).cast("long")).as("xm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    require(n > 0, "empty training corpus")
    val w = scala.collection.mutable.LinkedHashMap(
      classes.map(_ -> Array.fill(dim)(0L)): _*)
    for (_ <- 0 until iters) {
      val wMap = typedlit(w.map { case (c, a) => c -> a.toSeq }.toMap)
      val wvec = element_at(wMap, col("cls"))
      val zMicro2 = aggregate(
        zip_with(col("xm"), wvec, (x, wc) => x * wc), lit(0L), (a, b) => a + b)
      val pm = round(
        lit(1.0) / (lit(1.0) + exp(-(zMicro2.cast("double") / 1e12))) * 1e6, 0)
        .cast("long")
      val ym = (col("lab") === col("cls")).cast("long") * lit(1000000L)
      val sums = base
        .select(col("lab"), col("xm"), explode(typedlit(classes)).as("cls"))
        .select(col("cls"), (pm - ym).as("r"), col("xm"))
        .select(col("cls"), col("r"), posexplode(col("xm")).as(Seq("j", "x")))
        .groupBy("cls", "j")
        .agg(sum((col("r") * col("x")).cast("decimal(38,0)")).as("s"))
        .collect()
      sums.foreach { row =>
        val (c, j) = (row.getString(0), row.getInt(1))
        val sd = row.getDecimal(2).doubleValue()
        w(c)(j) = math.rint(w(c)(j) - lr * sd / (n * 1e6)).toLong
      }
    }
    base.unpersist()
    w.toSeq
  }

  /** Predict a language per document from [[trainOneVsRestClassifiers]]
    * models: every class's sigmoid score is computed MAP-SIDE against its
    * broadcast-literal weights (features embedded once per row, zero
    * shuffles, zero state), and the prediction is the argmax with
    * ascending-class precedence on rounded-score ties — the same cascade
    * shape as the [[TextFunctions.langId]] heuristic, so both are exactly
    * SQL-replayable. Returns `(idCol, pred_lang, score)` with `score` the
    * winning class's 6-rounded sigmoid.
    */
  def predictLangOneVsRest(df: DataFrame, textCol: String, idCol: String,
      models: Seq[(String, Array[Long])]): DataFrame = {
    require(models.nonEmpty && models.map(_._1) == models.map(_._1).sorted,
      "models must be in ascending class order")
    graft.expr.VecExpressions.register(df.sparkSession)
    val dim = models.head._2.length
    val xm = transform(
      coalesce(call_function("hashed_embed", col(textCol), lit(dim)),
        array_repeat(lit(0f), dim)),
      x => round(x.cast("double") * 1e6, 0).cast("long"))
    val scores: Seq[(String, Column)] = models.map { case (c, wm) =>
      val zMicro2 = aggregate(
        zip_with(xm, typedlit(wm.toSeq), (x, w) => x * w), lit(0L), (a, b) => a + b)
      c -> round(lit(1.0) / (lit(1.0) + exp(-(zMicro2.cast("double") / 1e12))), 6)
    }
    def cascade(i: Int): Column =
      if (i == scores.size - 1) lit(scores(i)._1)
      else when(scores.drop(i + 1).map(_._2).foldLeft(lit(true)) {
          (acc, s) => acc && scores(i)._2 >= s
        }, scores(i)._1).otherwise(cascade(i + 1))
    df.select(col(idCol),
      cascade(0).as("pred_lang"),
      scores.map(_._2).reduce(greatest(_, _)).as("score"))
  }

  /** Score documents with a [[trainTextClassifier]] weight vector:
    * `(idCol, score)` with `score = σ(w·x)` rounded to 6 decimals — a
    * pure narrow map (features and margin recomputed map-side, weights a
    * broadcast literal), zero shuffles.
    */
  def scoreTextClassifier(df: DataFrame, textCol: String, idCol: String,
      weightsMicro: Array[Long]): DataFrame = {
    graft.expr.VecExpressions.register(df.sparkSession)
    val dim = weightsMicro.length
    val xm = transform(
      coalesce(call_function("hashed_embed", col(textCol), lit(dim)),
        array_repeat(lit(0f), dim)),
      x => round(x.cast("double") * 1e6, 0).cast("long"))
    val zMicro2 = aggregate(
      zip_with(xm, typedlit(weightsMicro.toSeq), (x, w) => x * w),
      lit(0L), (a, b) => a + b)
    df.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-(zMicro2.cast("double") / 1e12))), 6)
        .as("score"))
  }

  /** EXACT binary AUC (Mann–Whitney rank-sum form with tie-corrected
    * average ranks) — the evaluation primitive behind every
    * quality-classifier threshold decision: the probability a random
    * positive outranks a random negative. `AUC = (2·ΣR⁺ − n⁺(n⁺+1)) /
    * (2·n⁺·n⁻)` where ΣR⁺ sums positives' AVERAGE ranks (tie groups
    * share `offset + (n+1)/2`), kept integral by carrying 2×rank:
    * `2·ΣR⁺ = Σ_groups n⁺_g·(2·offset_g + n_g + 1)`.
    *
    * Scale shape: one partial-aggregable groupBy collapses the corpus to
    * per-distinct-score rows; the cumulative offset is a window over
    * that SCORE table (bounded by distinct score values — 6-rounded
    * sigmoids cap it at ~10⁶ rows regardless of corpus size, the
    * vocab-not-corpus contract); moments are exact DECIMAL(38) sums
    * (2·ΣR⁺ passes 2⁶³ near 10¹⁰ rows), and the single double division
    * happens once at the end, 6-rounded — bit-identical in SQL.
    *
    * @return one row: `(n_pos, n_neg, auc)`; `auc` null when either
    *         class is empty (undefined, not 0).
    */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("np"))
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("off", coalesce(sum(col("n")).over(w), lit(0L)))
    cum.agg(
        sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np").cast("decimal(38,0)")
          * (lit(2L) * col("off") + col("n") + lit(1L))).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(round(
            (col("r2").cast("double")
              - col("n_pos").cast("double") * (col("n_pos").cast("double") + lit(1.0)))
              / (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc"))
  }

  /** Calibration (reliability) bins — [[binaryAuc]]'s companion: AUC
    * says the classifier RANKS well, calibration says its scores MEAN
    * what they claim (a 0.9-bin whose empirical positive rate is 0.55
    * mis-prices every threshold cut downstream). Scores land in
    * `bins` equal-width buckets (`floor(s·bins)`, top edge clamped);
    * per bin: row count, positives, 6-rounded mean score and empirical
    * positive rate.
    *
    * One partial-aggregable pass; per-bin score sums carried as exact
    * micro-LONGs inside DECIMAL(38) (6-rounded scores are exact micro
    * integers, so the mean is an exact ratio until its one double
    * division — order-free at any parallelism).
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    df.select(
        least(floor(col(scoreCol) * bins).cast("long"), lit(bins - 1L)).as("bin"),
        round(col(scoreCol) * 1e6, 0).cast("long").as("sm"),
        col(labelCol).cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("sm").cast("decimal(38,0)")).as("sms"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sms").cast("double") / 1e6 / col("n").cast("double"), 6)
          .as("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
  }

  /** Vocabulary growth curve (Heaps' law empirics): distinct-vocabulary
    * size after each successive `buckets`-ile of the corpus (ordered by
    * a deterministic hash bucket of the doc id) plus token volume — the
    * curve that says whether more data still buys new vocabulary or the
    * corpus has saturated (and the sanity check before vocab-dependent
    * choices like tokenizer size).
    *
    * Scale shape — the naive form rescans the corpus once per prefix
    * (`buckets×` cost); this is ONE pass: each word's FIRST bucket of
    * appearance (`groupBy(word).min(bucket)` — partial-aggregable), one
    * count per first-bucket, and a `buckets`-row cumulative window.
    * `vocab(k) = Σ_{b ≤ k} |{words first seen in b}|` exactly. Token
    * totals ride the same pass keyed by bucket.
    *
    * @return one row per bucket: `(bucket, n_tokens, cum_tokens,
    *         new_words, vocab)` — all exact LONGs.
    */
  def vocabGrowth(df: DataFrame, textCol: String, idCol: String,
      buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val b = Sampling.hashBucket(col(idCol), buckets).as("bucket")
    val tok = df.select(b, explode(TextFunctions.tokens(col(textCol))).as("w"))
    val firsts = tok.groupBy("w").agg(min(col("bucket")).as("fb"))
      .groupBy(col("fb").as("bucket")).agg(count(lit(1)).as("new_words"))
    val tokens = tok.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokens.join(firsts, Seq("bucket"), "left")
      .select(col("bucket").cast("long").as("bucket"), col("n_tokens"),
        coalesce(col("new_words"), lit(0L)).as("new_words"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("vocab", sum(col("new_words")).over(w))
      .select(col("bucket"), col("n_tokens"), col("cum_tokens"),
        col("new_words"), col("vocab"))
  }

  /** Repetition / boilerplate metrics (Gopher-style repetition signals):
    * duplicate-word fraction `1 − |distinct tokens| / |tokens|` and
    * duplicate-bigram fraction `1 − |distinct bigrams| / |bigrams|`.
    * Heavily templated or looping text scores high; natural prose scores
    * near the corpus baseline. Pure narrow map: the distinct counts come
    * from the native [[graft.expr.WordShingles]] kernel (n=1 tokens, n=2
    * bigrams) — no explode, no shuffle.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.expr.VecExpressions.register(df.sparkSession)
    val toks = TextFunctions.tokens(col(textCol))
    val nToks = size(toks)
    val nDistinct = size(call_function("word_shingles", col(textCol), lit(1)))
    val nBigrams = nToks - 1
    val nDistinctBi = size(call_function("word_shingles", col(textCol), lit(2)))
    df.select(col(idCol).as("id"),
      nToks.cast("long").as("n_tokens"),
      round(when(nToks === 0, lit(0.0))
        .otherwise(lit(1.0) - nDistinct.cast("double") / nToks), 6).as("dup_word_ratio"),
      round(when(nBigrams <= 0, lit(0.0))
        .otherwise(lit(1.0) - nDistinctBi.cast("double") / nBigrams), 6).as("dup_bigram_ratio"))
  }

  /** Token-distribution drift between two corpora as smoothed KL
    * divergence, decomposed per token — the distribution-shift monitor a
    * training pipeline runs between train/validation splits, crawl
    * snapshots, or mixture revisions. Per token over the UNION vocab
    * (add-one smoothing keeps every term finite):
    * `contrib(t) = p(t)·ln(p(t)/q(t))`, `p = (c_ref+1)/(N_ref+V)`,
    * `q = (c_cur+1)/(N_cur+V)`; `KL = Σ contrib`. The top movers (by
    * |contrib|) name WHAT drifted, the total says HOW MUCH.
    *
    * Engine parity: counts and the smoothing sums are exact LONGs, and
    * every downstream double is assembled FACTOR-WISE —
    * `p = (c_ref+1)/(N_ref+V)`, `q = (c_cur+1)/(N_cur+V)`, ln argument
    * `p/q` — never as an integer cross-product (the
    * `(c_ref+1)·(N_cur+V)` form overflows 2^63 once corpora pass ~10⁹
    * tokens; each individual factor stays < 2^53, so the divisions are
    * IEEE-exact in both engines — the [[pmiCollocations]] overflow
    * lesson applied from the start). Contributions are quantized to
    * integer micro-nats (`round(p·ln(p/q)·10⁶)` — the
    * [[unigramSurprisal]] rule), and the total KL is an order-free LONG
    * sum of those micro-units, identical under any partitioning.
    *
    * Scale shape: two token-count aggregations (map-side partial), one
    * full-outer vocab join keyed on token, scalar totals broadcast, and
    * a `TakeOrderedAndProject` top-k. The vocab join is token-keyed —
    * Zipf heads are ONE ROW each here (counts, not occurrences), so no
    * skew.
    */
  def tokenKlDrift(ref: DataFrame, cur: DataFrame, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    def counts(df: DataFrame) =
      df.select(explode(TextFunctions.tokens(col(textCol))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
    val cr = counts(ref)
    val cc = counts(cur)
    val vocab = cr.select(col("t"), col("c").as("c_ref"))
      .join(cc.select(col("t"), col("c").as("c_cur")), Seq("t"), "full_outer")
      .select(col("t"), coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val totals = vocab.agg(sum(col("c_ref")).as("n_ref"),
      sum(col("c_cur")).as("n_cur"), count(lit(1)).as("v"))
    val p = (col("c_ref") + 1).cast("double") / (col("n_ref") + col("v")).cast("double")
    val q = (col("c_cur") + 1).cast("double") / (col("n_cur") + col("v")).cast("double")
    val contrib = vocab.crossJoin(broadcast(totals))
      .select(col("t"), col("c_ref"), col("c_cur"),
        round(p * log(p / q) * 1e6, 0).cast("long").as("contrib_micro"))
    val klTotal = contrib.agg(sum(col("contrib_micro")).as("kl_micro"))
    contrib.crossJoin(broadcast(klTotal))
      .orderBy(abs(col("contrib_micro")).desc, col("t"))
      .limit(k)
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic — the DISTRIBUTION
    * twin of [[tokenKlDrift]]'s vocabulary drift: `D = sup_x |F_ref(x)
    * − F_cur(x)|` over a per-document numeric statistic (length,
    * quality score, perplexity). KS catches the drift KL cannot see —
    * a location/scale shift in a continuous statistic barely moves
    * token frequencies but walks the empirical CDFs apart — and it is
    * the standard ingest-monitoring alarm between corpus versions.
    *
    * Exactness: no doubles until the last line. The CDF gap at x is
    * `|c_ref(x)·n_cur − c_cur(x)·n_ref| / (n_ref·n_cur)` — the
    * numerator is exact in DECIMAL(38,0) (the cross product alone
    * passes 2⁶³ near 10¹⁰×10¹⁰ rows), the argmax is a struct-ordered
    * max with min-x tiebreak, and the single double division is
    * 6-rounded at emit. Both engines replay it bit-for-bit.
    *
    * Scale shape: one partial-aggregable count per side collapses each
    * corpus to DISTINCT-VALUE rows (the vocab-not-corpus contract —
    * 6-rounded scores / integer lengths bound the merged table far
    * below corpus size); the cumulative counts are ONE window over that
    * value table ([[binaryAuc]]'s posture: distinct-value-bounded, swap
    * in a range-partitioned prefix sum if a statistic is ever truly
    * continuous); the argmax is a 1-row aggregate. The driver sees one
    * row.
    *
    * @return one row `(n_ref, n_cur, ks_at, ks)` — `ks_at` the smallest
    *         value attaining the sup.
    */
  def ksDrift(ref: DataFrame, cur: DataFrame, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // micro-integer values (×1e6, the engine-wide exactness convention),
    // NOT cast-to-long truncation: a [0,1]-range statistic (quality
    // score) would collapse every value to bin 0 and the alarm would
    // silently never fire. Monotone + injective at 1e-6 resolution, so
    // the CDF ordering — and hence D — is preserved for integral inputs
    // and faithfully resolved for continuous ones; ks_at divides back to
    // the caller's scale at emit.
    def toMicro(c: Column): Column = round(c.cast("double") * lit(1e6), 0).cast("long")
    val a = ref.select(toMicro(col(valCol)).as("x"))
      .filter(col("x").isNotNull).groupBy("x").agg(count(lit(1)).as("a"))
    val b = cur.select(toMicro(col(valCol)).as("x"))
      .filter(col("x").isNotNull).groupBy("x").agg(count(lit(1)).as("b"))
    val merged = a.join(b, Seq("x"), "full_outer")
      .select(col("x"), coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
    val n = merged.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"))
    val w = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = merged
      .withColumn("c1", sum(col("a")).over(w))
      .withColumn("c2", sum(col("b")).over(w))
      .crossJoin(broadcast(n))
      .select(col("x"),
        abs(col("c1").cast("decimal(38,0)") * col("n2")
          - col("c2").cast("decimal(38,0)") * col("n1")).as("dnum"),
        col("n1"), col("n2"))
    scored
      .agg(max(struct(col("dnum"), (-col("x")).as("nx"))).as("best"),
        first(col("n1")).as("n_ref"), first(col("n2")).as("n_cur"))
      .select(col("n_ref"), col("n_cur"),
        round((-col("best.nx")).cast("double") / lit(1e6), 6).as("ks_at"),
        round(col("best.dnum").cast("double")
          / (col("n_ref").cast("double") * col("n_cur").cast("double")), 6)
          .as("ks"))
  }

  /** DOCUMENT-frequency vocabulary pruning — the CountVectorizer
    * `min_df`/`max_df` band: tokens in fewer than `minDf` documents are
    * noise (typos, ids), tokens in more than `maxDfPct`% of documents
    * are boilerplate/stopwords; both poison features. Distinct from
    * [[oovRate]]'s total-frequency top-k: df counts each document once
    * (a token spammed 500× in one doc is still df=1) and the band cuts
    * BOTH tails. Labels every token rather than filtering, so the
    * decision is auditable. One distinct + one partial-aggregable count;
    * the doc total enters as a broadcast 1-row aggregate and the band
    * test is pure integer arithmetic (`df·100` vs `pct·n` — no ratio
    * doubles to disagree on).
    */
  def dfPruneVocab(df: DataFrame, textCol: String, idCol: String,
      minDf: Long, maxDfPct: Int): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    require(maxDfPct >= 1 && maxDfPct <= 100, s"maxDfPct out of [1,100]: $maxDfPct")
    val docTok = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("t")).distinct()
    val nDocs = df.select(col(idCol)).distinct().agg(count(lit(1)).as("n_docs"))
    docTok.groupBy("t").agg(count(lit(1)).as("df_count"))
      .crossJoin(broadcast(nDocs))
      .select(col("t"), col("df_count"),
        when(col("df_count") < minDf, lit("too_rare"))
          .when(col("df_count") * 100 > lit(maxDfPct.toLong) * col("n_docs"),
            lit("too_common"))
          .otherwise(lit("kept")).as("status"))
  }

  /** Out-of-vocabulary rate under a TRUNCATED top-k vocabulary — the
    * tokenizer-budget diagnostic: pick the `vocabSize` most frequent
    * tokens (total `(count DESC, token)` order, so the cutoff tie is
    * deterministic), then score every document by the fraction of its
    * tokens that fall outside — the documents a fixed-vocab tokenizer
    * will shred into bytes. One corpus count (map-side partial), a
    * `TakeOrderedAndProject` vocab cut, and a BROADCAST left join back
    * onto the exploded corpus (explicit: the corpus side is Zipf-keyed —
    * the [[unigramSurprisal]] skew rule). The rate is one exact-LONG
    * double division.
    */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive: $vocabSize")
    val tok = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(vocabSize)
      .select(col("t"), lit(1L).as("in_v"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** Per-document character-distribution Shannon entropy — the cheap
    * degenerate-text screen below even [[repetitionStats]]: binary
    * junk/mojibake scores high, single-character spam scores ~0, natural
    * language sits in a narrow band (≈ 2.8–3.2 nats for English), so
    * both tails are filterable. `H = −Σ (c/n)·ln(c/n)` over the doc's
    * character counts.
    *
    * Parity: each term is quantized to integer micro-nats BEFORE the
    * per-doc sum ([[unigramSurprisal]]'s rule — the sum is then
    * order-free LONG arithmetic), with `c/n` formed as one double
    * division of exact longs. Two shuffles, both partial-aggregable:
    * (doc, char) counts, then the per-doc term sum; the totals join is
    * co-partitioned with the counts by the doc key.
    */
  def charEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ch = df.select(col(idCol).as("id"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) === 1) // empty-text artifact guard
    val counts = ch.groupBy("id", "ch").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("id").agg(sum(col("c")).as("n"))
    val frac = col("c").cast("double") / col("n").cast("double")
    counts.join(totals, "id")
      .select(col("id"), col("n"),
        round(-frac * log(frac) * 1e6, 0).cast("long").as("term"))
      .groupBy("id")
      .agg(max(col("n")).as("n_chars_counted"),
        sum(col("term")).as("entropy_micro"))
  }

  /** Deterministic token-dropout augmentation — the word-dropout text
    * augmentation of the robust-training literature, made seed-free:
    * token (doc, pos) survives iff its md5 bucket ≥ `dropPct`, so the
    * augmented corpus is a pure function of the input (regenerable,
    * cacheable, identical across engines and runs — the [[Sampling
    * .hashBucket]] philosophy applied inside documents instead of
    * across them). Entirely NARROW: the mask and reassembly are one
    * index-aware `filter` higher-order function over the token array —
    * no explode, no shuffle, order preserved for free (the first cut
    * exploded + regrouped the corpus; one row-local lambda replaced a
    * corpus-wide shuffle and ran 5× faster).
    */
  def tokenDropout(df: DataFrame, textCol: String, idCol: String,
      dropPct: Int): DataFrame = {
    require(dropPct >= 0 && dropPct < 100, s"dropPct out of [0,100): $dropPct")
    val toks = TextFunctions.tokens(col(textCol))
    val kept = filter(toks, (t, i) =>
      pmod(conv(substring(md5(concat_ws("#",
          col(idCol).cast("string"), i.cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(100L)) >= dropPct)
    df.select(col(idCol).as("id"),
      size(toks).cast("long").as("n_orig"),
      size(kept).cast("long").as("n_kept"),
      concat_ws(" ", kept).as("aug_text"))
  }

  /** Pairwise VOCABULARY overlap between corpus groups (languages,
    * sources, crawl snapshots): exact token-set Jaccard and containment
    * for every group pair — the dataset-level diagnostic that catches a
    * mislabeled source or a cross-lingual contamination path before
    * per-document dedup ever runs.
    *
    * Scale shape: the token frame is DISTINCT (group, token) — Zipf
    * heads collapse to ≤ |groups| rows per token, so the pair join's
    * per-key fan-out is bounded by the group count squared, never by
    * corpus frequency. One distinct, one self-join on token, one
    * partial-aggregable pair count. Pairs with empty intersection are
    * absent (inner join) — at |groups| ≤ thousands the dense completion
    * is a driver-side concern, not an engine one.
    */
  def vocabOverlap(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(groupCol).as("g"),
      explode(TextFunctions.tokens(col(textCol))).as("t")).distinct()
    val sizes = tok.groupBy("g").agg(count(lit(1)).as("nv"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.t") === col("b.t") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("g").as("g1"), col("nv").as("v1")), "g1")
      .join(sizes.select(col("g").as("g2"), col("nv").as("v2")), "g2")
      .select(col("g1"), col("g2"), col("v1"), col("v2"), col("inter"),
        (col("inter").cast("double") / (col("v1") + col("v2") - col("inter")))
          .as("jaccard"),
        (col("inter").cast("double") / least(col("v1"), col("v2")))
          .as("containment"))
  }

  /** [[vocabOverlap]]'s estimate-by-sketch sibling: per-group k-min
    * MINHASH SIGNATURES over the token vocabulary, pairwise similarity
    * estimated as the fraction of matching signature positions — the
    * shape that survives when vocabularies are too large to self-join:
    * each group compresses to k LONGs (mergeable: min is associative,
    * so shard signatures combine map-side and incrementally across
    * snapshots), and the pair comparison touches k·|groups| rows
    * instead of the union vocabulary. Hashes are md5-derived
    * (position-seeded: `md5(i # token)` — engine-portable, the
    * [[Sampling.hashBucket]] rule), so the signature itself is
    * deterministic and exactly replayable; the ESTIMATE is what it is
    * (±1/√k) — gate-exact because both engines compute the identical
    * sketch. Every pair is present (k aligned positions always join),
    * unlike the exact op's inner-join sparsity.
    */
  def minhashVocabOverlap(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"k out of [1,64]: $k")
    val tok = df.select(col(groupCol).as("g"),
      explode(TextFunctions.tokens(col(textCol))).as("t")).distinct()
    val sig = tok
      .select(col("g"), posexplode(array((0 until k).map(i =>
        conv(substring(md5(concat_ws("#", lit(i), col("t"))), 1, 12), 16, 10)
          .cast("long")): _*)).as(Seq("i", "h")))
      .groupBy("g", "i").agg(min(col("h")).as("m"))
    sig.as("a").join(sig.as("b"),
        col("a.i") === col("b.i") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(sum(when(col("a.m") === col("b.m"), 1L).otherwise(0L)).as("matches"))
      .select(col("g1"), col("g2"), col("matches"),
        (col("matches").cast("double") / k).as("est_jaccard"))
  }

  /** C4-style boilerplate detection at n-gram granularity: an n-gram
    * whose DOCUMENT frequency reaches `minDf` is boilerplate (navigation
    * chrome, license headers, "click here to unsubscribe…" — text that
    * recurs across unrelated pages), and each document is scored by the
    * fraction of its distinct n-grams that are boilerplate — the
    * filter/strip signal a pretraining pipeline thresholds on before
    * near-dup detection ever runs.
    *
    * Scale shape: one explode of distinct per-doc shingles (so the
    * per-shingle count IS document frequency — no count-distinct), one
    * groupBy(shingle) for df, then a join of the exploded frame against
    * only the shingles that PASSED the df bar. That survivor set is the
    * broadcast side by construction: boilerplate vocabulary is the
    * Zipf HEAD of the shingle distribution — df ≥ minDf caps its size
    * at |corpus-shingle-occurrences| / minDf, and in practice it is
    * thousands of rows at any corpus size, so the per-doc scoring join
    * ships no shuffle at all. Docs shorter than n words score 0 via the
    * greatest(n_sh, 1) guard.
    */
  def boilerplateShingleStats(df: DataFrame, textCol: String, idCol: String,
      n: Int, minDf: Int): DataFrame = {
    require(n >= 1 && minDf >= 2, s"bad params n=$n minDf=$minDf")
    graft.expr.VecExpressions.register(df.sparkSession)
    val sh = df.select(col(idCol).as("doc_id"),
      call_function("word_shingles", col(textCol), lit(n)).as("sh"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val boiler = ex.groupBy("s").agg(count(lit(1)).as("df_s"))
      .filter(col("df_s") >= minDf)
    val nb = ex.join(broadcast(boiler.select("s")), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
    sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
      .join(nb, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(coalesce(col("n_boiler"), lit(0L)).cast("double") /
          greatest(col("n_sh"), lit(1L)), 6).as("boiler_ratio"))
  }

  /** Reason-coded Gopher-style quality filter (the rule family of Rae
    * et al. 2021 §A1.1, reduced to the signals this corpus carries):
    * token-count bounds, mean-word-length bounds, minimum stopword
    * count, and top-token repetition share — evaluated as a FIXED
    * cascade so every document gets exactly one verdict, and the first
    * failing rule names WHY it was dropped (the audit trail a curation
    * run owes its operators; a bare boolean filter can't tell you that
    * your new crawl slice died 80% on `low_stopword`).
    *
    * Every comparison is integer-exact — mean length as
    * `10·Σlen vs bound×10·n`, repetition as `1000·top_cnt vs permille·n`
    * — so the cascade is engine- and partitioning-invariant with no
    * float epsilon anywhere. Two partial-aggregable passes: per-(doc,
    * token) counts (for the top-token share), then the per-doc rollup.
    *
    * @param meanLenMinX10 lower mean-word-length bound × 10
    * @param maxTopPermille max share of the most frequent token, permille
    */
  def gopherFilter(df: DataFrame, textCol: String, idCol: String,
      minTokens: Long, maxTokens: Long,
      meanLenMinX10: Long, meanLenMaxX10: Long,
      minStopwords: Long, maxTopPermille: Long): DataFrame = {
    val ex = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
    val perTok = ex.groupBy("doc_id", "tok").agg(
      count(lit(1)).as("c"), length(col("tok")).cast("long").as("len"),
      max(col("tok").isin(TextFunctions.Stopwords: _*)).as("is_stop"))
    val agg = perTok.groupBy("doc_id").agg(
      sum(col("c")).as("n_tokens"),
      sum(col("len") * col("c")).as("sum_len"),
      sum(when(col("is_stop"), col("c")).otherwise(lit(0L))).as("n_stop"),
      max(col("c")).as("top_cnt"))
    // token-free documents vanish from the explode — restore them with
    // zero stats so the cascade still files them (under too_short)
    val st = df.select(col(idCol).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_len"), lit(0L)).as("sum_len"),
        coalesce(col("n_stop"), lit(0L)).as("n_stop"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"))
    st.select(col("doc_id"), col("n_tokens"), col("sum_len"),
        col("n_stop"), col("top_cnt"),
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(lit(10L) * col("sum_len") < lit(meanLenMinX10) * col("n_tokens"),
            "words_too_short")
          .when(lit(10L) * col("sum_len") > lit(meanLenMaxX10) * col("n_tokens"),
            "words_too_long")
          .when(col("n_stop") < minStopwords, "low_stopword")
          .when(lit(1000L) * col("top_cnt") > lit(maxTopPermille) * col("n_tokens"),
            "repetitive")
          .otherwise("kept").as("verdict"))
  }

  /** CCNet-style duplicated-segment REMOVAL with document reassembly
    * (Wenzek et al. 2020 §4.1 dedups at the line level; this corpus is
    * single-line, so the unit generalizes to fixed `segTokens`-token
    * windows): every segment whose corpus-wide occurrence count reaches
    * `minDf` is boilerplate and is cut from EVERY document that carries
    * it (first occurrences included — the CCNet rule), and the
    * survivors are stitched back in original order. This is the
    * curation family's missing MUTATION step: t41 scores boilerplate
    * load, d14 locates copied spans — this one rewrites the corpus.
    *
    * Scale shape: segmentation is one narrow projection (token-array
    * `slice`s — no per-token explode before the df pass needs one); the
    * df aggregate is the single corpus-scale shuffle, and its `minDf`
    * survivor head is Zipf-bounded by `Σtokens / (segTokens·minDf)`, so
    * the removal join broadcasts it and stays map-side (t41's shape; at
    * a low-threshold regime where the head outgrows broadcast, drop the
    * hint and let AQE plan the equi-join). Reassembly shuffles only the
    * KEPT segments once on the doc key, partial-aggregable all the way.
    * Deleting a whole document (all segments boilerplate) yields an
    * empty `clean_text`, not a dropped row — the caller decides.
    *
    * @return (doc_id, n_segs, n_removed, clean_text) — original token
    *         count recoverable as `n_segs`·window arithmetic; removal
    *         audit per doc, cleaned doc reassembled
    */
  def dedupSegments(df: DataFrame, textCol: String, idCol: String,
      segTokens: Int, minDf: Int): DataFrame = {
    require(segTokens >= 1 && minDf >= 2, s"bad params seg=$segTokens minDf=$minDf")
    val toks = TextFunctions.tokens(col(textCol))
    // ceil-div segment count; sequence(0, -1) would yield [0, -1], so
    // empty docs short-circuit to an empty segment array
    // Column `/` is double division — floor+cast back for the ceil-div
    val nSeg = floor((size(toks) + lit(segTokens - 1)) / lit(segTokens)).cast("int")
    val segs = when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nSeg - 1),
        i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " ")))
    val base = df.select(col(idCol).as("doc_id"), segs.as("segs"))
    val ex = base.select(col("doc_id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
    val boiler = ex.groupBy("seg").agg(count(lit(1)).as("df_s"))
      .filter(col("df_s") >= minDf)
    val kept = ex.join(broadcast(boiler.select("seg")), Seq("seg"), "left_anti")
    val rebuilt = kept
      .groupBy("doc_id").agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(
          col("seg_idx").as("i"), col("seg").as("s")))), x => x.getField("s")),
          " ").as("clean_text"))
    base.select(col("doc_id"), size(col("segs")).cast("long").as("n_segs"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        (col("n_segs") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
