package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions

/** Tokenizer-training operators: the vocabulary-construction step a
  * training-data pipeline runs BEFORE it can token-count, pack, or price
  * a corpus (the reference pipeline consumes text downstream of exactly
  * such a tokenizer; `TextFunctions.bpeTokenCountEstimate` approximates
  * one — this module trains the real thing's first merges).
  */
object Tokenize {

  /** One canonical BPE merge pass over a space-joined symbol string: a
    * left-to-right fold that replaces each non-overlapping adjacent
    * `(l, r)` with `l+r` — `[a,a,a,a,a,a]` under `(a,a)` becomes
    * `[aa,aa,aa]`, the Sennrich rule (a single string `replace` gets
    * this WRONG: its one pass consumes the shared separator and strands
    * `[aa,a,aa,a]`). The fold carries the space-joined prefix as its
    * accumulator, so "previous symbol" tests are exact-boundary string
    * checks; a just-merged symbol can never re-merge because the
    * accumulator then ends with `l+r`, not `l`. An interpreted
    * higher-order fold, deliberately: it runs over VOCABULARY rows (one
    * corpus shuffle reduces 100 TB to ~10⁷-10⁸ words), where linear
    * interpreted work is noise — never over the corpus.
    */
  private def mergePass(syms: Column, l: String, r: String): Column =
    aggregate(
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      try_element_at(syms, lit(1)),
      (acc, x) => when(
        x === lit(r) && (acc === lit(l) || acc.endsWith(lit(" " + l))),
        concat(acc.substr(lit(1), length(acc) - lit(l.length)), lit(l + r)))
        .otherwise(concat(acc, lit(" "), x)))

  private def resplit(sym: Column): Column = array_remove(split(sym, " "), "")

  /** First `rounds` BPE merges (Sennrich et al. 2016) trained distributed.
    *
    * Classic BPE shape: the working set is the WORD-FREQUENCY table, not
    * the corpus — one corpus-wide shuffle builds `(word, n)` (at 100 TB
    * that is the only pass over the data; vocabulary cardinality is
    * ~10⁷-10⁸ rows from then on), each word becomes its symbol sequence,
    * and every round is: count adjacent symbol pairs weighted by word
    * frequency (partial-aggregable — map-side combine collapses the
    * Zipf head before the shuffle), take the global argmax
    * (`TakeOrderedAndProject` limit-1 — ONE `(pair, count)` row reaches
    * the driver per round, the [[Similarity.trainCentroids]]
    * driver-bounded-loop contract), and apply [[mergePass]] everywhere.
    *
    * Determinism: pair counts are exact LONG sums; argmax ties break on
    * the pair string ascending; the fold is position-exact. The oracle
    * replays every round independently — same weighted counts, same
    * rank-1 tie-break, same fold via DuckDB `list_reduce`.
    *
    * @return one row per merge round:
    *         `(round, lhs, rhs, merged, n_pair)`.
    */
  /** The WORD-FREQUENCY relation `(w, n)` — the one corpus-wide pass
    * every tokenizer-family op starts from (BPE training, unigram
    * Viterbi). Exposed so callers can derive it ONCE, persist it, and
    * feed the `…FromWords` variants: at 100 TB the corpus shuffle is
    * the dominant cost and there is no reason to pay it per consumer.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  def bpeMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    bpeMergesFromWords(wordCounts(df, textCol), rounds)

  /** [[bpeMerges]] from a precomputed `(w, n)` word-frequency relation
    * ([[wordCounts]]) — bit-identical output, corpus pass skipped.
    */
  def bpeMergesFromWords(words: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val s = words.sparkSession
    val wf = words
      .select(array_join(regexp_extract_all(col("w"), lit("."), lit(0)), " ")
        .as("sym"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = wf
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    for (r <- 1 to rounds if merges.length == r - 1) {
      val toks = resplit(col("sym"))
      val pairs = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))
      val best = cur
        .select(explode(pairs).as("p"), col("n"))
        .groupBy("p").agg(sum(col("n")).as("c"))
        .orderBy(desc("c"), asc("p"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (p, c) = (best(0).getString(0), best(0).getLong(1))
        val Array(l, rr) = p.split(" ", 2)
        merges += Row(r, l, rr, l + rr, c)
        // localCheckpoint each round's vocab (still ~100 bytes/word —
        // the same artifact class as the minhash signatures). The
        // TRUNCATION matters as much as the caching: `persist` keeps
        // the chained logical plan alive, and at deep merge counts the
        // driver goes quadratic in catalyst re-analysis + plan-string
        // formatting (measured: a 64-merge run at sf0.1 spent >45 min
        // INSIDE TreeNode.formatArg before any 64th-round work — the
        // same lineage blowup the iterative graph ops cut per round).
        val next = cur.withColumn("sym", mergePass(resplit(col("sym")), l, rr))
          .localCheckpoint(true)
        prev.foreach(_.unpersist())
        prev = if (cur eq wf) None else Some(cur)
        cur = next
      }
    }
    prev.foreach(_.unpersist())
    if (!(cur eq wf)) cur.unpersist()
    wf.unpersist()
    s.createDataFrame(s.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("n_pair", LongType, nullable = false))))
  }

  /** [[bpeMerges]] with BATCHED rounds — the scale path for real 32k-merge
    * vocabularies, where one Spark job per merge is a driver-side
    * serialization bottleneck (32k sequential jobs). Output is
    * **bit-identical** to the sequential trainer: per round we take the
    * top-`batchK` `(pair, count)` rows (ONE driver-bounded collect) and
    * accept a rank-ordered PREFIX of provably-safe merges, applying them
    * in one fold. A candidate at rank i+1 is accepted only while three
    * conditions hold, each sufficient to make it the exact sequential
    * argmax at its step:
    *
    *  1. **Disjoint prefix**: it shares no symbol with any accepted
    *     candidate, and every pair ranked above it was accepted. Merging
    *     `(l,r)` only removes adjacencies of pairs containing `l` or `r`
    *     (the fold leaves zero `(l,r)` leftovers, and old-symbol
    *     adjacencies are never created), so a symbol-disjoint pair's
    *     count — including its reported `n_pair` — is untouched.
    *  2. **New-pair bound**: its count strictly exceeds every accepted
    *     merge's new-pair ceiling. Each occurrence of a pair involving a
    *     new symbol `lr` maps injectively to an original occurrence of a
    *     pair straddling the merge boundary — `(x, lr)` ← `(x, l)`,
    *     `(lr, y)` ← `(r, y)`, `(l₁r₁, l₂r₂)` ← `(r₁, l₂)` — so
    *     `max(max_x c(x,l), max_y c(r,y))` over the ROUND's own count
    *     table bounds every pair a prior accepted merge can create.
    *  3. **No symbol collision**: no accepted merged string `l+r` equals
    *     an existing symbol (else existing pairs' counts could GROW by
    *     new occurrences); the batch closes after such a merge.
    *
    * The ceiling/collision statistics ride the top-K collect itself
    * (one union job per round; the per-symbol maxima tables are
    * symbol-vocabulary-bounded), so a round is one collect + one
    * checkpoint regardless of how many merges it admits.
    *
    * Measured honestly (BpeBenchProbe, documents sf0.1, 64 merges,
    * local[4]): sequential 15.4 s / 197 jobs, batched 11.8 s /
    * 341 jobs, outputs bit-equal. Two findings. (1) The dominant
    * driver bottleneck was never the per-merge round-trip — it was
    * LINEAGE: with `persist` alone the 64-merge sequential run spent
    * >48 minutes inside catalyst plan formatting before finishing;
    * `localCheckpoint` per round (now in both trainers) is the >170×
    * fix. (2) On natural text the exactness rules admit small batches
    * (the hottest pairs share symbols, and a hot boundary symbol
    * caps the new-pair ceiling near the top count), so batching is a
    * modest win here; it widens on corpora whose top pairs are
    * symbol-disjoint. The bit-exactness constraint is fundamental —
    * the new-symbol takeover case in BpeBatchedSpec shows any looser
    * batching diverges from Sennrich semantics. Gated:
    * `t50_bpe_batched` replays the SEQUENTIAL oracle; BpeBatchedSpec
    * proves equality on the adversarial corpora.
    */
  def bpeMergesBatched(df: DataFrame, textCol: String, rounds: Int,
      batchK: Int = 64): DataFrame =
    bpeMergesBatchedFromWords(wordCounts(df, textCol), rounds, batchK)

  /** [[bpeMergesBatched]] from a precomputed `(w, n)` relation
    * ([[wordCounts]]) — bit-identical output, corpus pass skipped.
    */
  def bpeMergesBatchedFromWords(words: DataFrame, rounds: Int,
      batchK: Int = 64): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(batchK >= 1, s"batchK must be >= 1: $batchK")
    val s = words.sparkSession
    val wf = words
      .select(array_join(regexp_extract_all(col("w"), lit("."), lit(0)), " ")
        .as("sym"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = wf
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var exhausted = false
    while (merges.length < rounds && !exhausted) {
      val toks = resplit(col("sym"))
      val pairsCol = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))
      val pc = cur
        .select(explode(pairsCol).as("p"), col("n"))
        .groupBy("p").agg(sum(col("n")).as("c"))
        .select(col("p"), col("c"),
          substring_index(col("p"), " ", 1).as("lhs"),
          substring_index(col("p"), " ", -1).as("rhs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // ONE collect per round carries everything the acceptance rules
      // need: the top-K candidates plus the per-symbol pair-count maxima
      // (tag L: max over pairs ENDING in s — bounds new `(x, s·r)`
      // pairs; tag R: max over pairs STARTING in s — bounds `(l·s, y)`).
      // The maxima tables are SYMBOL-vocabulary-bounded (chars + merges
      // so far, ≤ ~64k rows at a full 32k-merge training — a ~1 MB
      // driver row set), and their key union is exactly the set of
      // pair-participating symbols, which doubles as the merged-string
      // collision test. Folding the probe into the top-K job keeps the
      // batched path at 2 jobs/round (collect + checkpoint) — never
      // MORE driver round-trips than sequential even when the
      // disjointness rules only admit one merge.
      val gathered = pc.orderBy(desc("c"), asc("p")).limit(batchK)
        .select(lit("T").as("t"), col("p"), col("c"))
        .unionAll(pc.groupBy(col("rhs").as("p")).agg(max(col("c")).as("c"))
          .select(lit("L").as("t"), col("p"), col("c")))
        .unionAll(pc.groupBy(col("lhs").as("p")).agg(max(col("c")).as("c"))
          .select(lit("R").as("t"), col("p"), col("c")))
        .collect()
      // union leg order is not contractual — re-rank the candidates on
      // the driver with the exact (count desc, pair asc) tie-break
      val top = gathered.filter(_.getString(0) == "T")
        .sortBy(r => (-r.getLong(2), r.getString(1)))
      if (top.isEmpty) exhausted = true
      else {
        val cands = top.map { r =>
          val Array(l, rr) = r.getString(1).split(" ", 2)
          (l, rr, r.getLong(2))
        }
        val maxcLeft = gathered.filter(_.getString(0) == "L")
          .map(r => r.getString(1) -> r.getLong(2)).toMap
        val maxcRight = gathered.filter(_.getString(0) == "R")
          .map(r => r.getString(1) -> r.getLong(2)).toMap
        val existingSyms = maxcLeft.keySet ++ maxcRight.keySet
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var bound = 0L
        var open = true
        for (cand @ (l, r, c) <- cands
             if open && merges.length + accepted.length < rounds) {
          if (accepted.isEmpty ||
              (!used(l) && !used(r) && c > bound)) {
            accepted += cand
            used += l; used += r
            bound = math.max(bound,
              math.max(maxcLeft.getOrElse(l, 0L), maxcRight.getOrElse(r, 0L)))
            if (existingSyms(l + r)) open = false
          } else open = false
        }
        val base = merges.length
        accepted.zipWithIndex.foreach { case ((l, r, c), i) =>
          merges += Row(base + i + 1, l, r, l + r, c)
        }
        // ONE fold applies the whole batch in priority order;
        // localCheckpoint truncates the per-round lineage (see
        // [[bpeMerges]] — the batched fold expression is batchK merges
        // wide, so an uncut chain would blow up even faster here)
        val mergedSym = accepted.foldLeft(resplit(col("sym"))) {
          case (acc, (l, r, _)) => resplit(mergePass(acc, l, r))
        }
        val next = cur.withColumn("sym", array_join(mergedSym, " "))
          .localCheckpoint(true)
        prev.foreach(_.unpersist())
        prev = if (cur eq wf) None else Some(cur)
        cur = next
      }
      pc.unpersist()
    }
    prev.foreach(_.unpersist())
    if (!(cur eq wf)) cur.unpersist()
    wf.unpersist()
    s.createDataFrame(s.sparkContext.parallelize(merges.toSeq, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("n_pair", LongType, nullable = false))))
  }

  /** Segment a word with a trained merge list: replay the merges in
    * training order (merge PRIORITY = training order — the standard BPE
    * inference rule), one [[mergePass]] per merge. A pure narrow map —
    * the merge table is baked into the expression tree, nothing
    * shuffles. Appends a `pieces` array column.
    */
  def bpeSegment(df: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val chars = regexp_extract_all(col(wordCol), lit("."), lit(0))
    val merged = merges.foldLeft(array_join(chars, " ")) { case (acc, (l, r)) =>
      mergePass(resplit(acc), l, r)
    }
    df.withColumn("pieces", resplit(merged))
  }

  /** SentencePiece-style UNIGRAM-LM segmentation — the other half of the
    * tokenizer family next to [[bpeMerges]]/[[bpeSegment]]: pieces are
    * scored independently (`cost(p) = −ln p(p)`, add-1-smoothed
    * substring frequencies over the word-frequency table), and each word
    * takes its MINIMUM-total-cost split via Viterbi DP. Everything runs
    * on the DISTINCT-word vocabulary (corpus-size-independent after the
    * one word-count shuffle — the same economics as BPE training), the
    * piece costs are micro-rounded LONGs so path sums are exact
    * integers, and the DP unrolls one position per round (`rounds`
    * bounded frames, each a tiny vocab-scale join), so the whole
    * chain — candidate pieces, costs, every DP round, the
    * (cost, longer-piece, lexicographic) argmin — replays in SQL.
    *
    * Determinism: ties broken by (total cost, longer last piece first,
    * then the path string) — no RNG, no float comparisons (costs are
    * integer micro-nats).
    *
    * @param maxPieceLen max piece length considered (vocab = all corpus
    *        substrings up to this length, weighted by word frequency)
    * @param rounds DP positions unrolled; must cover the longest word
    *        (REQUIRED — fails loudly rather than mis-segmenting)
    * @return (word, wc, pieces '|'-joined, n_pieces, cost_micro)
    */
  def unigramViterbiSegment(df: DataFrame, textCol: String,
      maxPieceLen: Int, rounds: Int): DataFrame =
    unigramViterbiSegmentFromWords(wordCounts(df, textCol),
      maxPieceLen, rounds)

  /** [[unigramViterbiSegment]] from a precomputed `(w, n)` relation
    * ([[wordCounts]]) — bit-identical output, corpus pass skipped.
    */
  def unigramViterbiSegmentFromWords(wordsIn: DataFrame,
      maxPieceLen: Int, rounds: Int): DataFrame = {
    require(maxPieceLen >= 1 && rounds >= 1, s"bad $maxPieceLen/$rounds")
    val words = wordsIn.select(col("w"), col("n").as("wc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxLen = words.agg(max(length(col("w")))).head().getInt(0)
    require(maxLen <= rounds,
      s"longest word ($maxLen chars) exceeds the $rounds-round DP budget")
    // candidate pieces: every (start, len<=maxPieceLen) substring of every
    // word, weighted by word frequency; costs from add-1 smoothing over
    // the piece vocabulary
    val pieces = words.select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")))).as("j"))
      .select(col("w"), col("wc"), col("j"),
        explode(sequence(lit(1), least(lit(maxPieceLen),
          length(col("w")) - col("j") + 1))).as("l"))
      .select(col("wc"), substring_pos(col("w"), col("j"), col("l")).as("p"))
    val cnts = pieces.groupBy("p").agg(sum(col("wc")).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cnts.agg(sum(col("cnt")).as("c_tot"), count(lit(1)).as("v")).head()
    val (cTot, v) = (totals.getLong(0), totals.getLong(1))
    val costs = cnts.select(col("p"),
      round(-log((col("cnt") + 1).cast("double") / lit(cTot + v)) * 1e6, 0)
        .cast("long").as("pc"))
    // Viterbi: best(word, i) = min over piece ending at i; one tiny
    // vocab-scale frame per position, argmin via min(struct) — the
    // engine-deterministic total order (cost, −len, path)
    var best = words.select(col("w"), col("wc"), lit(0L).as("cost"),
      lit("").as("seg"))
    val states = new Array[DataFrame](rounds + 1)
    states(0) = best
    for (i <- 1 to rounds) {
      val cands = (1 to math.min(maxPieceLen, i)).map { l =>
        states(i - l).filter(length(col("w")) >= i)
          .select(col("w"), col("wc"),
            substring(col("w"), i - l + 1, l).as("p"), lit(l.toLong).as("pl"),
            col("cost"), col("seg"))
      }.reduce(_ unionByName _)
      states(i) = cands.join(broadcast(costs), "p")
        .select(col("w"), col("wc"),
          struct((col("cost") + col("pc")).as("c"), (-col("pl")).as("nl"),
            when(col("seg") === "", col("p"))
              .otherwise(concat(col("seg"), lit("|"), col("p"))).as("s")).as("cand"))
        .groupBy("w", "wc").agg(min(col("cand")).as("best"))
        .select(col("w"), col("wc"), col("best.c").as("cost"),
          col("best.s").as("seg"))
        .localCheckpoint()
    }
    val done = (1 to rounds).map(i =>
        states(i).filter(length(col("w")) === i))
      .reduce(_ unionByName _)
    words.unpersist(); cnts.unpersist()
    done.select(col("w").as("word"), col("wc"),
      col("seg").as("pieces"),
      (size(split(col("seg"), "\\|"))).cast("long").as("n_pieces"),
      col("cost").as("cost_micro"))
  }

  /** `substring(w, j, l)` with COLUMN position/length (the built-in
    * `substring` takes Ints) — `substr` expression form.
    */
  private def substring_pos(w: Column, j: Column, l: Column): Column =
    w.substr(j, l)
}
