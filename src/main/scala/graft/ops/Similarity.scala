package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.VecExpressions
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over dense embedding columns
  * (`array<float>`).
  *
  * Two tiers:
  *   - [[bruteForceTopK]] — exact cosine top-k via a broadcast
  *     queries × corpus join. The correctness baseline; scales linearly in
  *     corpus size with the query set broadcast to every executor, so it
  *     is actually the right production shape whenever |queries| is small.
  *   - [[ivfTopK]] — IVF-style cell-probed search: vectors are assigned to
  *     their nearest centroid (map-side, centroids broadcast), queries
  *     probe only the `nprobe` nearest cells. At 100 TB this turns a full
  *     corpus scan per query into a scan of nprobe/ncells of the data,
  *     with the corpus pre-partitionable by cell id.
  *
  * Cost shape: vector norms are computed once per row and materialized
  * below the join; the only per-pair work is one `vec_dot` — a native
  * codegen'd loop ([[graft.expr.VecExpressions]]), not a per-element
  * lambda (the HOF form measured ~25 µs/pair, which IS the runtime of an
  * all-pairs join).
  *
  * Determinism: similarities are rounded to 6 decimals BEFORE ranking and
  * ties broken by vector id, so rankings are reproducible bit-for-bit
  * across engines (float fold order differs at ~1e-13; the rounding
  * absorbs it).
  */
object Similarity {

  private def rounded(c: Column): Column = round(c, 6)

  private def withNorm(df: DataFrame, id: String, vec: String,
      idOut: String, vecOut: String, nrmOut: String): DataFrame = {
    VecExpressions.register(df.sparkSession)
    df.select(col(id).as(idOut), col(vec).as(vecOut),
      normNative(col(vec)).as(nrmOut))
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "nn_id", "nn_vec", "nn_nrm")
    val q = withNorm(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm")
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        rounded(cosineWithNorms(col("q_vec"), col("nn_vec"), col("q_nrm"), col("nn_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cosine"))
  }

  /** Deterministic IVF: centroids are the vectors whose id satisfies
    * `id % centroidEvery == 0` (a training-free, oracle-reproducible stand-in
    * for k-means — swap in real cluster centers at production scale; the
    * plan shape is identical). Each corpus vector lands in the cell of its
    * L2-nearest centroid; each query probes its `nprobe` nearest cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      centroidEvery: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    val cents = corpus.filter(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))

    // map-side cell assignment: nearest centroid by (rounded L2, cent_id)
    def assign(df: DataFrame, id: String, vec: String, nrm: String,
        rankCol: String, keep: Int): DataFrame = {
      val scored = df.join(broadcast(cents))
        .select(col(id), col(vec), col(nrm), col("cent_id"),
          rounded(sqrt(l2NativeSq(col(vec), col("cent_vec")))).as("d"))
      val w = Window.partitionBy(id).orderBy(col("d"), col("cent_id"))
      scored.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= keep)
        .select(col(id), col(vec), col(nrm), col("cent_id"))
    }

    val cells = assign(withNorm(corpus, idCol, vecCol, "nn_id", "nn_vec", "nn_nrm"),
      "nn_id", "nn_vec", "nn_nrm", "cell_rank", 1)
    val probes = assign(withNorm(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm"),
      "query_id", "q_vec", "q_nrm", "probe_rank", nprobe)

    val scored = cells.join(probes,
        cells("cent_id") === probes("cent_id") && col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        rounded(cosineWithNorms(col("q_vec"), col("nn_vec"), col("q_nrm"), col("nn_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (id1 < id2, cosine ≥ threshold).
    * All-pairs baseline; block with [[ivfTopK]]-style cells at scale.
    *
    * The selective predicate runs in two stages: a raw-double prefilter at
    * `threshold − 1e-6` (pushed into the join condition — plain compare,
    * stays in codegen) and the exact `round(·,6) ≥ threshold` check on the
    * survivors only. `round` allocates a BigDecimal per call; keeping it
    * out of the O(n²) join condition is a ~6× end-to-end win, and the
    * margin (round moves a value by ≤ 5e-7) makes the two-stage filter
    * decision-identical to rounding every pair.
    */
  def cosineDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = withNorm(df, idCol, vecCol, "id", "v", "nrm")
    // stream-side repartition: all-pairs parallelism must not depend on
    // the source's file partitioning (see simhashDupPairs)
    val stream = v.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    stream.as("a").join(broadcast(v.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        cosineWithNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold - 1e-6)
      .select(col("id1"), col("id2"), rounded(col("cos_raw")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
