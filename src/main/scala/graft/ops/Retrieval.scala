package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions

/** Sparse (lexical) retrieval — the BM25 / inverted-index half of a
  * hybrid RAG stack, built as plain shuffles so Catalyst keeps the whole
  * plan codegen'd.
  *
  * The 100 TB shape: the corpus-side statistics (term frequencies,
  * document lengths, document frequencies) are each ONE partial-aggregable
  * pass over the tokenized corpus; the query set is tiny by definition
  * (it's what a user typed / an eval batch), so the probe is a
  * `broadcast(query_terms) ⋈ tf` hash join — the classic term-at-a-time
  * inverted-index probe with the posting table as the only big side,
  * partitioned by term. The one genuine scale hazard is the stopword
  * posting list: a term appearing in half the corpus turns the probe join
  * into a corpus-sized explode for every query that contains it. BM25's
  * idf already assigns such terms ~zero weight, so [[bm25TopK]] takes a
  * `maxDfPermille` static-pruning threshold (the degenerate-but-effective
  * end of the Block-Max-WAND family: drop postings that cannot matter
  * instead of scoring them) — expressed in integer arithmetic
  * (`df * 1000 <= permille * n`) so the cut is engine-exact.
  *
  * Float discipline (same contract as [[Curation.unigramSurprisal]]):
  * every per-(query,term,doc) contribution is rounded to integer
  * micro-units BEFORE the per-document sum, so the aggregate is
  * order-free, partitioning-invariant, and bit-identical in any engine
  * that parses the same double expression.
  */
object Retrieval {

  /** BM25 parameters carried as exact decimal literals (both engines
    * parse "1.2"/"0.75" to the same double).
    */
  val K1 = 1.2
  val B = 0.75

  /** Per-document token-frequency + length frame: (doc_id, term, tf, dl).
    * One tokenize pass, one shuffle on (doc, term).
    */
  def termFrequencies(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("ts"))
      .select(col("doc_id"), size(col("ts")).as("dl"), explode(col("ts")).as("term"))
    toks.groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
  }

  /** The persisted inverted-index artifact: per term its document
    * frequency, total term count, the sorted posting list, and the
    * largest doc-id gap inside it (the statistic that decides how well
    * delta-gap compression will do on that list). Postings are plain
    * sorted arrays — engine-portable, mergeable across shards by
    * `array_union`+sort, and the direct input to any posting-intersection
    * query. One shuffle on the term; `collect_list` is bounded per group
    * by that term's df (the same bound any inverted index lives with —
    * stopword rows are exactly what [[bm25TopK]]'s df-pruning drops
    * before this artifact is probed).
    */
  def postingLists(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    postingListsFromTf(termFrequencies(docs, textCol, idCol))

  /** [[postingLists]] from a precomputed tf relation
    * ([[termFrequencies]]' shape) — the artifact path: at 100 TB the tf
    * table is derived once at ingest and every index build reads it.
    */
  def postingListsFromTf(tf: DataFrame): DataFrame = {
    val agg = tf.groupBy("term").agg(
      count(lit(1)).as("df"),
      sum(col("tf")).as("tf_sum"),
      sort_array(collect_list(col("doc_id"))).as("postings"))
    val tail = greatest(size(col("postings")) - 1, lit(0))
    agg.withColumn("max_gap",
        coalesce(array_max(zip_with(
          slice(col("postings"), lit(2), tail),
          slice(col("postings"), lit(1), tail),
          (a, b) => a - b)), lit(0L)))
      .select(col("term"), col("df"), col("tf_sum"), col("postings"), col("max_gap"))
  }

  /** Corpus-level scalars BM25 needs: (n, dl_sum) — one partial-agg scan
    * of the raw documents (counts token-free docs too, which the tf
    * relation structurally cannot).
    */
  def docStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n"),
      sum(TextFunctions.tokenCount(col(textCol))).as("dl_sum"))

  /** BM25 scores for a (query_id, term) probe set against the corpus.
    *
    * @param queryTerms   distinct (query_id, term) rows — broadcast side
    * @param maxDfPermille drop query terms whose df exceeds this fraction
    *                      of the corpus (integer permille so the cut is
    *                      exact); None scores every term
    * @return (query_id, doc_id, score_micro) — fixed-point micro-unit sum
    */
  def bm25Scores(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: DataFrame, maxDfPermille: Option[Long] = None): DataFrame =
    // Deliberately NOT persisted even though the df aggregation and the
    // probe join both consume the tf lineage: A/B at sf0.1 (min-of-3
    // warm) measured 3.30 s recomputed vs 5.02 s persisted — the
    // whole-stage-codegen'd tokenize+shuffle re-run is cheaper than
    // MEMORY_AND_DISK materialization for a relation this narrow. The
    // once-per-corpus answer to repeated probing is the bucketed
    // artifact path ([[bm25ScoresFromTf]] / io15), not a query-local
    // cache.
    bm25ScoresFromTf(
      termFrequencies(docs, textCol, idCol),
      docStats(docs, textCol), queryTerms, maxDfPermille)

  /** [[bm25Scores]] from a PRECOMPUTED term-frequency relation — the
    * artifact path. At 100 TB the tf table is written once at ingest,
    * `bucketBy(N, term)`: the df aggregation and every term-keyed probe
    * then read bucket-aligned splits with NO query-time Exchange on the
    * corpus side (locked in BucketedJoinSpec), which turns per-query
    * BM25 cost into `broadcast-probe + bucket-local agg` — the
    * inverted-index economics search engines run on.
    *
    * @param tf    (doc_id, term, tf, dl) — [[termFrequencies]]' shape
    * @param stats 1-row (n, dl_sum) — [[docStats]]
    */
  def bm25ScoresFromTf(tf: DataFrame, stats: DataFrame,
      queryTerms: DataFrame, maxDfPermille: Option[Long] = None): DataFrame = {
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val pruned = maxDfPermille match {
      case Some(p) => dfreq.crossJoin(broadcast(stats.select(col("n").as("n_p"))))
        .filter(col("df") * 1000 <= lit(p) * col("n_p")).drop("n_p")
      case None => dfreq
    }
    // idf = ln(1 + (n - df + 0.5)/(df + 0.5)); tfn = tf(k1+1)/(tf + k1(1-b+b·dl/avgdl))
    // — mirrored token-for-token in the DuckDB oracle; rounded to micro
    // BEFORE the per-doc sum so addition order cannot matter.
    val avgdl = col("dl_sum").cast("double") / col("n")
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = col("tf") * lit(K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / avgdl))
    tf.join(broadcast(queryTerms.select(col("query_id"), col("term"))), "term")
      .join(broadcast(pruned), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(idf * tfn * 1e6, 0).cast("long").as("c_micro"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c_micro")).as("score_micro"))
  }

  /** Top-k BM25 hits per query: (query_id, rank, doc_id, score). */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: DataFrame, k: Int, maxDfPermille: Option[Long] = None): DataFrame =
    rankTopK(bm25Scores(docs, textCol, idCol, queryTerms, maxDfPermille), k)

  /** [[bm25TopK]] over the persisted tf artifact ([[bm25ScoresFromTf]]). */
  def bm25TopKFromTf(tf: DataFrame, stats: DataFrame,
      queryTerms: DataFrame, k: Int, maxDfPermille: Option[Long] = None): DataFrame =
    rankTopK(bm25ScoresFromTf(tf, stats, queryTerms, maxDfPermille), k)

  private def rankTopK(scores: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score_micro"), col("doc_id"))
    scores
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score_micro").cast("double") / 1e6, 6).as("score"))
  }

  /** Graded retrieval metrics — MRR and NDCG@k of a ranked list against
    * a binary relevance set, per query. The discount table
    * `1/log2(rank+1)` is micro-rounded ONCE into a k-row broadcast frame
    * (so per-query DCG/IDCG are exact integer sums — order-free and
    * engine-replayable), and IDCG is the ideal prefix sum over
    * `min(n_rel, k)` discounts via the same table. Rank rows only ever
    * reach the metric groupBy: queries × k, driver-scale at any corpus
    * size — the expensive part is whatever produced the ranking, not
    * the grading.
    *
    * @param ranked   (query_id, item_id, rank) — rank 1-based, unique
    * @param relevant (query_id, item_id) — the binary relevance truth
    * @return per query: n_rel, first_rel_rank (0 = none), rr_micro,
    *         dcg_micro, idcg_micro, ndcg (null when no relevant items)
    */
  def ndcgAtK(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"bad k=$k")
    val terms = ranked.sparkSession.range(1, k + 1L).select(
      col("id").as("rank"),
      round(lit(1e6) * log(lit(2.0)) / log(col("id") + lit(1.0)), 0)
        .cast("long").as("term_micro"))
    val rel = relevant.select(col("query_id"), col("item_id"), lit(1L).as("rel"))
    val marked = ranked.filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("rank").cast("long").as("rank"))
      .join(rel, Seq("query_id", "item_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val perq = marked.join(broadcast(terms), "rank")
      .groupBy("query_id").agg(
        sum(when(col("rel") === 1, col("term_micro")).otherwise(lit(0L)))
          .as("dcg_micro"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel_rank"))
    val nrel = relevant.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val idcg = nrel.join(broadcast(terms),
        col("rank") <= least(col("n_rel"), lit(k.toLong)))
      .groupBy("query_id", "n_rel").agg(sum(col("term_micro")).as("idcg_micro"))
    perq.join(idcg, Seq("query_id"), "full")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("first_rel_rank"), lit(0L)).as("first_rel_rank"),
        coalesce(round(lit(1e6) / col("first_rel_rank"), 0).cast("long"), lit(0L))
          .as("rr_micro"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        when(coalesce(col("idcg_micro"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(round(coalesce(col("dcg_micro"), lit(0L)).cast("double")
            / col("idcg_micro"), 6)).as("ndcg"))
  }

  /** Reciprocal-Rank Fusion of ranked lists from heterogeneous
    * retrievers (the standard dense+sparse hybrid: neither cosine nor
    * BM25 scores are commensurable, but ranks always are).
    * `rrf(d) = Σ_lists 1/(k0 + rank_list(d))`, carried in integer
    * micro-units (`round(1e6/(k0+rank))` — exact for any rank, so the
    * fused ordering is engine- and order-independent).
    *
    * Input frames each carry (query_id, item_id, rank); the union is
    * rank-rows only (queries × k per list — driver-scale), so fusion is
    * a tiny groupBy, never a corpus pass.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val unioned = lists.map(_.select(col("query_id"), col("item_id"), col("rank")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy("query_id")
      .orderBy(desc("rrf_micro"), col("item_id"))
    unioned
      .select(col("query_id"), col("item_id"),
        round(lit(1e6) / (lit(k0) + col("rank")), 0).cast("long").as("c"))
      .groupBy("query_id", "item_id")
      .agg(sum(col("c")).as("rrf_micro"), count(lit(1)).as("n_lists"))
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("fused_rank"), col("item_id"),
        col("rrf_micro"), col("n_lists"))
  }

  /** TF-IDF top-k KEYWORD extraction — the document-side dual of
    * [[bm25TopK]]'s query-side probe: for every document, its k most
    * characteristic terms by `tf · ln(n/df)` (the classic smooth-free
    * form; df ≥ 1 for every term actually present, so the log argument
    * is always ≥ 1). The tagging/labeling primitive of corpus triage —
    * near-free once [[termFrequencies]] exists.
    *
    * Scale shape: df is one partial-aggregable aggregate of the tf
    * relation; the corpus total is a 1-row broadcast; scoring is a
    * broadcast(df-table) hash join when the vocab is Zipf-head bounded
    * (it is, after `maxDfPermille` drops nothing here — df joins are
    * vocab-not-corpus); the per-document top-k is `row_number ≤ k`,
    * which Catalyst turns into a map-side partial top-k
    * (WindowGroupLimit — the same O(docs·k) shuffle bound t74 rides).
    * Scores micro-rounded ONCE per (doc, term) — order-free,
    * engine-exact thereafter.
    *
    * @return (doc_id, rank, term, tfidf_micro)
    */
  def tfidfTopK(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val tf = termFrequencies(docs, textCol, idCol)
    val n1 = docs.select(col(idCol)).agg(count(lit(1)).as("n"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("tfidf_micro"), col("term"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n1))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n").cast("double") / col("df")) * 1e6, 0)
          .cast("long").as("tfidf_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf_micro"))
  }
}
