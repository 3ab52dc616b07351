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

  /** Contrastive-pair mining for embedding-model training: per query,
    * the k nearest OTHER-label vectors (hard negatives — the confusable
    * examples a triplet/InfoNCE loss learns most from) plus the single
    * nearest SAME-label vector (the hard positive), with the triplet
    * margin `pos_cos − neg_cos` in exact micro units — negative margins
    * are active triplets. One cosine pass feeds both sides; the exact
    * scorer is [[bruteForceTopK]]'s broadcast shape (queries are the
    * mining batch — bounded), and at corpus scale the candidate pass
    * swaps for the IVF cell join ([[ivfTopKFiltered]]'s routing with
    * the label predicate inverted) without touching the rank/margin
    * logic.
    *
    * @return (query_id, rank, neg_id, neg_cosine, pos_id, pos_cosine,
    *         margin_micro); pos columns null when the query's label has
    *         no other member
    */
  def hardNegativeMine(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
      normNative(col(vecCol)).as("nn_nrm"), col(labelCol).as("nn_label"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      normNative(col(vecCol)).as("q_nrm"), col(labelCol).as("q_label"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("q_label"), col("nn_id"), col("nn_label"),
        rounded(cosineWithNorms(col("q_vec"), col("nn_vec"),
          col("q_nrm"), col("nn_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("nn_id"))
    val negs = scored.filter(col("nn_label") =!= col("q_label"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("nn_id").as("neg_id"), col("cosine").as("neg_cosine"))
    val pos = scored.filter(col("nn_label") === col("q_label"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("query_id"), col("nn_id").as("pos_id"),
        col("cosine").as("pos_cosine"))
    negs.join(pos, Seq("query_id"), "left")
      .select(col("query_id"), col("rank"), col("neg_id"), col("neg_cosine"),
        col("pos_id"), col("pos_cosine"),
        round((col("pos_cosine") - col("neg_cosine")) * 1e6, 0).cast("long")
          .as("margin_micro"))
  }

  /** Deterministic Lloyd's k-means over the embedding column — the real
    * trainer behind [[ivfTopKWith]] (vs [[ivfTopK]]'s id-derived,
    * oracle-reproducible stand-in). Fully distributed per iteration:
    * centroids broadcast, each vector assigned map-side to its L2-nearest
    * cell, means recomputed with ONE groupBy over (cell, dimension). Only
    * k·dim aggregate rows (and the k init vectors) ever reach the driver —
    * never corpus rows — so the loop runs unchanged at 100 TB; set
    * `sampleEvery` > 1 to train on a deterministic id-sampled subset,
    * the standard move at that scale.
    *
    * Determinism (seed-free by construction): init = the k lowest-id
    * vectors; assignment distance is 6-decimal-rounded (the same
    * [[assignCells]] discipline — raw doubles would leave the argmin
    * exposed to last-ulp fold wobble across engines) with ties broken by
    * cent_id; each new mean is rounded to 6 decimals, absorbing the
    * ~1e-13 double-fold-order wobble of a distributed avg, then truncated
    * to float — two runs produce bit-identical centroids, and the whole
    * loop is replayable in plain SQL (gated: sim7 hashes the centroid
    * table against a DuckDB re-derivation, sim8 gates search over it).
    * Cells that lose every member keep their previous centroid.
    *
    * Returns `(cent_id int, cent_vec array<float>)`, directly consumable
    * by [[ivfTopKWith]].
    */
  def trainCentroids(df: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sampleEvery: Int = 1): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val s = df.sparkSession
    import s.implicits._
    VecExpressions.register(s)
    // Persisted: each Lloyd's iteration (and the init collect) re-reads
    // this frame — without the cache that is `iters + 1` full source scans
    // at corpus scale.
    val sample =
      (if (sampleEvery > 1) df.filter(col(idCol) % sampleEvery === 0) else df)
        .select(col(idCol).cast("long").as("id"),
          col(vecCol).cast("array<double>").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def centsDf(cs: Array[Array[Double]]): DataFrame =
      s.createDataset(cs.toSeq.zipWithIndex
          .map { case (v, i) => (i, v.map(_.toFloat).toSeq) })
        .toDF("cent_id", "cent_vec")
        .withColumn("cent_vec", col("cent_vec").cast("array<float>"))
    var cents: Array[Array[Double]] = sample.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.length == k,
      s"corpus sample has only ${cents.length} vectors, need k=$k")
    for (_ <- 0 until iters) {
      // argmin by (d, cent_id) as a partial-aggregable groupBy — the k
      // candidate rows per vector collapse map-side BEFORE the shuffle
      // (a Window over id would shuffle and sort all k·n rows). Ties
      // break by cent_id via the struct ordering; `any_value(v)` is
      // deterministic because v is constant per id.
      val assigned = sample
        .withColumn("vf", col("v").cast("array<float>"))
        .join(broadcast(centsDf(cents)))
        .select(col("id"), col("v"),
          struct(rounded(sqrt(l2NativeSq(col("vf"), col("cent_vec")))).as("d"),
            col("cent_id").as("cent_id")).as("dc"))
      val members = assigned.groupBy("id")
        .agg(min(col("dc")).as("best"), any_value(col("v")).as("v"))
        .select(col("best.cent_id").as("cent_id"), posexplode(col("v")).as(Seq("pos", "x")))
      val means = members.groupBy("cent_id", "pos").agg(avg(col("x")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = math.rint(r.getDouble(2) * 1e6) / 1e6
      }
      cents = next
    }
    sample.unpersist()
    centsDf(cents)
  }

  /** Deterministic IVF: centroids are the vectors whose id satisfies
    * `id % centroidEvery == 0` (a training-free, oracle-reproducible stand-in
    * for k-means — [[trainCentroids]] + [[ivfTopKWith]] is the trained
    * production form; the plan shape is identical). Each corpus vector
    * lands in the cell of its L2-nearest centroid; each query probes its
    * `nprobe` nearest cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      centroidEvery: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKWith(corpus, queries, k, nprobe,
      corpus.filter(col(idCol) % centroidEvery === 0)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec")),
      idCol, vecCol)

  /** Cell assignment shared by [[ivfTopKWith]] and [[cosineDupPairs]]:
    * each vector keeps its `keep` L2-nearest centroids (ties by cent_id),
    * from candidates scored map-side against a broadcast centroid table.
    *
    * keep == 1 (the corpus side — the side that is 100 TB) is an argmin
    * expressed as a partial-aggregable groupBy, the same pattern as the
    * Lloyd's step in [[trainCentroids]]: the ncells candidate rows per
    * vector collapse map-side to ONE row before the shuffle, hash-based,
    * no sort. A Window would shuffle and locally sort all n×ncells rows.
    * `any_value` is deterministic here because vec/nrm are constant per id.
    *
    * keep > 1 (query probes / multi-probe dedup) stays a window rank:
    * there is no partial-aggregable bounded top-k among the algebraic
    * aggregates, and Spark's InferWindowGroupLimit already bounds the
    * shuffle to `keep` rows per id per input partition (plan-locked in
    * PlanAuditSpec), which at one row per (id, kept cell) is within keep×
    * of the groupBy form's volume.
    */
  private def assignCells(df: DataFrame, cents: DataFrame,
      id: String, vec: String, nrm: String, keep: Int): DataFrame = {
    val scored = df.join(broadcast(cents))
      .select(col(id), col(vec), col(nrm), col("cent_id"),
        rounded(sqrt(l2NativeSq(col(vec), col("cent_vec")))).as("d"))
    if (keep == 1)
      scored.groupBy(col(id))
        .agg(min(struct(col("d"), col("cent_id"))).as("best"),
          any_value(col(vec)).as(vec), any_value(col(nrm)).as(nrm))
        .select(col(id), col(vec), col(nrm), col("best.cent_id").as("cent_id"))
    else {
      val w = Window.partitionBy(id).orderBy(col("d"), col("cent_id"))
      scored.withColumn("__cell_rank", row_number().over(w))
        .filter(col("__cell_rank") <= keep)
        .select(col(id), col(vec), col(nrm), col("cent_id"))
    }
  }

  /** The IVF INDEX as data: each corpus vector's cell assignment under
    * a FROZEN centroid table — `(nn_id, nn_vec, nn_nrm, cent_id)`,
    * exactly what [[ivfTopKFromCells]] probes. Materializing this frame
    * (e.g. as a [[graft.io.Snapshots]] table) is what makes the index
    * INCREMENTAL at 100 TB: a new batch of vectors is assigned against
    * the same frozen centroids (one broadcast map-side pass over ONLY
    * the batch) and appended — history is never re-assigned, and
    * because assignment is a deterministic pure function of (vector,
    * centroids), append-then-search ≡ rebuild-then-search bit-for-bit
    * (sim23-gated). Re-train centroids only when drift degrades the
    * nprobe/recall operating point (sim21's curve is the monitor).
    */
  def ivfCells(corpus: DataFrame, cents: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    assignCells(withNorm(corpus, idCol, vecCol, "nn_id", "nn_vec", "nn_nrm"),
      cents, "nn_id", "nn_vec", "nn_nrm", 1)
  }

  /** Probe a PREBUILT cell-assignment frame ([[ivfCells]] output,
    * possibly reloaded from a persisted index artifact) — the search
    * half of [[ivfTopKWith]], touching only `nprobe` cells per query.
    */
  def ivfTopKFromCells(cells: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, cents: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(queries.sparkSession)
    val probes = assignCells(withNorm(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm"),
      cents, "query_id", "q_vec", "q_nrm", nprobe)

    val scored = cells.join(probes,
        cells("cent_id") === probes("cent_id") && col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        rounded(cosineWithNorms(col("q_vec"), col("nn_vec"), col("q_nrm"), col("nn_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cosine"))
  }

  /** K-CENTER GREEDY (farthest-point) selection — the diverse-subset
    * primitive of training-data curation (coreset seeding, eval-set
    * picking, dedup-aware sampling): start from the smallest id, then
    * repeatedly take the candidate whose distance to its NEAREST
    * already-selected center is LARGEST (ties to the smaller id; every
    * pairwise L2 micro-rounded to 6 before any argmin/argmax so two
    * engines agree bit-for-bit). The classic 2-approximation to the
    * k-center objective.
    *
    * Scale shape — INCREMENTAL dmin (the standard farthest-point
    * formulation): a running `(cand, cand_vec, dmin)` frame persists
    * across rounds (localCheckpoint truncates the lineage, the
    * Graph.scala pattern), and each round folds in ONLY the single new
    * center — one broadcast row, one `least(dmin, d_new)` map-side
    * pass, one max-struct aggregate whose single winning row reaches
    * the driver. Total distance work is O(k·n), not the O(k²·n) of
    * re-scoring every candidate against ALL selected centers each
    * round — same k scans, k× fewer distances, the shape that holds
    * when k is coreset-sized (thousands). Output is bit-identical to
    * the re-score-everything form: each pairwise distance is rounded
    * BEFORE any min, and `least` of previously-folded mins equals the
    * min over all pairs (spec-gated at k=8).
    *
    * @return (round, vec_id, min_dist) — round 1 is the seed, dist 0
    */
  def kCenterGreedy(corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    require(k >= 1, s"kCenterGreedy: k must be >= 1, got $k")
    val seedRow = corpus.agg(min(col(idCol))).head()
    require(!seedRow.isNullAt(0), "kCenterGreedy: empty corpus")
    val seed = seedRow.getLong(0)
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)](
      (1L, seed, 0.0))
    def selVecOf(id: Long) = broadcast(
      corpus.filter(col(idCol) === id).select(col(vecCol).as("sel_vec")))
    // seed the running frame: every non-seed candidate's distance to
    // the one selected center
    var run = corpus.filter(col(idCol) =!= seed)
      .select(col(idCol).as("cand"), col(vecCol).as("cand_vec"))
      .join(selVecOf(seed))
      .select(col("cand"), col("cand_vec"),
        rounded(sqrt(l2NativeSq(col("cand_vec"), col("sel_vec")))).as("dmin"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val row = run
        .agg(max(struct(col("dmin"), (-col("cand")).as("negid"))).as("best"))
        .select(col("best.dmin").as("dmin"), (-col("best.negid")).as("id"))
        .head()
      require(!row.isNullAt(0),
        s"kCenterGreedy: k=$k exceeds the corpus size (candidates " +
          s"exhausted at round $r)")
      val winner = row.getLong(1)
      sel += ((r.toLong, winner, row.getDouble(0)))
      if (r < k) {
        // fold ONLY the new center into the running minima; the prior
        // round's checkpoint frees as soon as the successor has
        // materialized (localCheckpoint is eager) — at coreset-scale k
        // leaving k n-row copies to GC timing would exhaust the block
        // manager mid-run
        val prev = run
        run = run.filter(col("cand") =!= winner)
          .join(selVecOf(winner))
          .select(col("cand"), col("cand_vec"),
            least(col("dmin"), rounded(sqrt(l2NativeSq(
              col("cand_vec"), col("sel_vec"))))).as("dmin"))
          .localCheckpoint()
        Checkpoints.free(prev)
      }
    }
    Checkpoints.free(run)
    val s = corpus.sparkSession
    val rows = sel.map { case (r, id, d) =>
      org.apache.spark.sql.Row(r, id, d)
    }
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("round",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("min_dist",
          org.apache.spark.sql.types.DoubleType))))
  }

  /** IVF cell-probed top-k against an explicit centroid table
    * `(cent_id, cent_vec: array<float>)` — e.g. [[trainCentroids]] output.
    */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      cents: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfTopKFromCells(ivfCells(corpus, cents, idCol, vecCol),
      queries, k, nprobe, cents, idCol, vecCol)

  /** Exact filtered-search truth: [[bruteForceTopK]] restricted to
    * candidates matching the query's `matchCol` — the baseline
    * [[ivfTopKFiltered]]'s recall is honestly graded against (recall vs
    * UNfiltered truth would conflate filter selectivity with retrieval
    * quality).
    */
  def bruteForceTopKFiltered(corpus: DataFrame, queries: DataFrame, k: Int,
      matchCol: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "nn_id", "nn_vec", "nn_nrm")
      .join(corpus.select(col(idCol).as("nn_id"), col(matchCol).as("nn_m")), "nn_id")
    val q = withNorm(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm")
      .join(queries.select(col(idCol).as("query_id"), col(matchCol).as("q_m")),
        "query_id")
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("nn_id") && col("nn_m") === col("q_m"))
      .select(col("query_id"), col("nn_id"),
        rounded(cosineWithNorms(col("q_vec"), col("nn_vec"),
          col("q_nrm"), col("nn_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cosine"))
  }

  /** Metadata-FILTERED IVF search — the tenant/language/category-routed
    * form of [[ivfTopK]]: a candidate must carry the query's `matchCol`
    * value, and the predicate applies PRE-distance, inside the cell
    * join, so a selective filter cuts cosine work proportionally
    * instead of ranking everything and discarding post-hoc. The
    * distinction matters for quality, not just cost: post-filtering an
    * unfiltered top-k loses exactly the hits the filter removes from
    * the head — at 10% selectivity that is ~90% of them — while
    * pre-filtering ranks within the eligible set from the start.
    *
    * LABEL-PARTITIONED index (the round-11 advisory fix): selectivity-
    * scaled probing of GLOBAL cells topped out at 0.633 recall at sf0.1 —
    * widening nprobe by 1/s_label assumes the label is spread uniformly
    * across cells, and the filtered truth's k-th neighbor lives farther
    * out in query space than the unfiltered one, so nearest-global-cell
    * order under-covers it. The partitioned design sidesteps both
    * failure modes: centroids are sampled PER LABEL (`id % centroidEvery
    * == 0`, plus each label's min-id vector so every label owns ≥ 1
    * cell), every corpus vector is assigned to its L2-nearest OWN-LABEL
    * centroid, and a query probes its `nprobe` nearest cells of its own
    * label's partition. Filtered search is then literally unfiltered IVF
    * run on the label sub-corpus — recall sits on [[ivfTopK]]'s measured
    * operating point (sim21's curve) by construction, independent of
    * filter sharpness. Rare labels degrade gracefully: a label too small
    * to sample a centroid keeps exactly one cell (its min-id vector), so
    * probing it IS the label-partitioned exact scan. The centroid table
    * stays `n/centroidEvery + |labels|` rows — same broadcast budget as
    * the global index — and cell population is ~centroidEvery regardless
    * of label skew, so the candidate equi-join buckets stay bounded at
    * 100 TB. This is the routing-column-partitioned layout a production
    * artifact persists (one label column prepended to the cell key).
    */
  def ivfTopKFiltered(corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, centroidEvery: Int, matchCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    val minLab = corpus.groupBy(col(matchCol).as("c_m"))
      .agg(min(col(idCol)).as("min_id"))
    val cents = corpus
      .join(broadcast(minLab), corpus(matchCol) === col("c_m"))
      .filter(col(idCol) % centroidEvery === 0 || col(idCol) === col("min_id"))
      .select(col("c_m"), col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
    // one-pass projections (id, vec, norm, label) — no self-join re-joins
    val cv = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
      normNative(col(vecCol)).as("nn_nrm"), col(matchCol).as("nn_m"))
    val scoredC = cv.join(broadcast(cents), col("nn_m") === col("c_m"))
      .select(col("nn_id"), col("nn_vec"), col("nn_nrm"), col("nn_m"), col("cent_id"),
        rounded(sqrt(l2NativeSq(col("nn_vec"), col("cent_vec")))).as("d"))
    // own-label argmin, partial-aggregable (assignCells keep=1 pattern)
    val cells = scoredC.groupBy("nn_id")
      .agg(min(struct(col("d"), col("cent_id"))).as("best"),
        any_value(col("nn_vec")).as("nn_vec"), any_value(col("nn_nrm")).as("nn_nrm"),
        any_value(col("nn_m")).as("nn_m"))
      .select(col("nn_id"), col("nn_vec"), col("nn_nrm"), col("nn_m"),
        col("best.cent_id").as("cent_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      normNative(col(vecCol)).as("q_nrm"), col(matchCol).as("q_m"))
    val qScored = qv.join(broadcast(cents), col("q_m") === col("c_m"))
      .select(col("query_id"), col("q_vec"), col("q_nrm"), col("q_m"), col("cent_id"),
        rounded(sqrt(l2NativeSq(col("q_vec"), col("cent_vec")))).as("d"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("d"), col("cent_id"))
    val probes = qScored.withColumn("__cell_rank", row_number().over(wProbe))
      .filter(col("__cell_rank") <= nprobe)
      .select(col("query_id"), col("q_vec"), col("q_nrm"), col("cent_id"), col("q_m"))
    val scored = cells.join(probes,
        cells("cent_id") === probes("cent_id") &&
          col("nn_m") === col("q_m") && col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        rounded(cosineWithNorms(col("q_vec"), col("nn_vec"),
          col("q_nrm"), col("nn_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs (id1 < id2, cosine ≥ threshold),
    * blocked on IVF cells: every vector is assigned to its `probes`
    * L2-nearest centroid cells (same deterministic centroid rule as
    * [[ivfTopK]]), candidate pairs are vectors sharing a cell, verified
    * exactly. The pairing join is an equi-join shuffled on the cell id —
    * no full-corpus broadcast, no quadratic nested loop — and cell
    * populations (corpus/ncells × probes) bound each join bucket, so the
    * shape survives a 1000-executor 100 TB corpus. Multi-probe covers the
    * near-cell-boundary pairs that single-cell assignment would split;
    * recall is empirically exact on the verified corpora (the DuckDB
    * oracle enumerates all-pairs) but, as with any IVF method, not a
    * mathematical guarantee — [[cosineDupPairsExact]] is the lossless
    * baseline.
    *
    * The selective predicate runs in two stages: a raw-double prefilter at
    * `threshold − 1e-6` (plain compare, stays in codegen) and the exact
    * `round(·,6) ≥ threshold` check on the survivors only. `round`
    * allocates a BigDecimal per call; keeping it off the per-candidate hot
    * path is a ~6× end-to-end win, and the margin (round moves a value by
    * ≤ 5e-7) makes the two-stage filter decision-identical to rounding
    * every pair.
    */
  def cosineDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      probes: Int = 2, centroidEvery: Int = 64): DataFrame = {
    val v = withNorm(df, idCol, vecCol, "id", "v", "nrm")
    val cents = df.filter(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
    val cells = assignCells(v, cents, "id", "v", "nrm", probes)
    cells.as("a").join(cells.as("b"),
        col("a.cent_id") === col("b.cent_id") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        cosineWithNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold - 1e-6)
      .select(col("id1"), col("id2"), rounded(col("cos_raw")).as("cosine"))
      .filter(col("cosine") >= threshold)
      // a pair sharing `probes` cells surfaces once per shared cell
      .distinct()
  }

  /** EXACT all-pairs cosine similarity join, distributed as a triangular
    * block grid — the lossless form of [[cosineDupPairs]] for thresholds
    * where geometric blocking cannot be lossless (in high dimension a
    * sound IVF probe radius for a loose threshold covers every cell, so
    * "approximate" quietly means "missing pairs"; this form misses none).
    *
    * Shape: ids hash into `blocks` buckets; each unordered bucket pair
    * (i ≤ j) is one grid cell, a-side rows replicate to cells (b, b..B-1),
    * b-side rows to (0..b, b), and the join is an EQUI-join on the cell
    * key — shuffled, memory-bounded (a task holds 2 buckets ≈ 2/B of the
    * corpus), no driver-side broadcast of anything. Every unordered pair
    * meets in exactly one cell: off-diagonal cells pair disjoint buckets;
    * diagonal cells order by id. Compute stays O(n²) — inherent to an
    * exact threshold join — but it spreads over B(B+1)/2 independently
    * schedulable cells, and replication cost is ~B/2× the (id, vec, norm)
    * projection, not the full table. Pick B so corpus/B fits an executor:
    * at 100 TB of raw docs the embedding projection is ~100s of GB; B=64
    * → ~2 GB per task side.
    */
  def cosineDupPairsExact(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      blocks: Int = 8): DataFrame = {
    val v = withNorm(df, idCol, vecCol, "id", "v", "nrm")
    val blk = pmod(xxhash64(col("id")), lit(blocks)).cast("int")
    val a = v.withColumn("bi", blk)
      .withColumn("bj", explode(sequence(col("bi"), lit(blocks - 1))))
    val b = v.withColumn("bj", blk)
      .withColumn("bi", explode(sequence(lit(0), col("bj"))))
    a.as("a").join(b.as("b"),
        col("a.bi") === col("b.bi") && col("a.bj") === col("b.bj") &&
        (col("a.bi") =!= col("a.bj") || col("a.id") < col("b.id")))
      .select(least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"),
        cosineWithNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold - 1e-6)
      .select(col("id1"), col("id2"), rounded(col("cos_raw")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Per-group embedding centroids (class prototypes / domain embeddings):
    * element-wise mean per group, one output row per (group, position).
    *
    * The accumulation is FIXED-POINT: each element is scaled by 2²⁰ and
    * rounded to a LONG before summing — the engine-wide exact-cents
    * discipline generalized to vectors. A plain double `sum` combines
    * partial aggregates in shuffle-arrival order, so its low bits (and
    * any rounded boundary value) vary run to run and engine to engine;
    * integer sums are order-free, making the centroid bit-stable for the
    * oracle AND across cluster re-runs. 2⁻²⁰ quantization error (~1e-6
    * per element) is far below float32 input precision. One explode +
    * one shuffle on (group, position).
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val scale = 1048576L // 2^20
    df.select(col(groupCol).as("g"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos0", "x")))
      .groupBy(col("g"), (col("pos0") + 1).as("pos"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("x") * scale, 0).cast("long")).as("s"))
      .select(col("g"), col("pos").cast("long").as("pos"), col("n"),
        round(col("s").cast("double") / col("n") / scale, 6).as("centroid"))
  }

  /** Deterministic ±1 random projection (Achlioptas-style
    * Johnson–Lindenstrauss sketch): `p_j = Σ_i v_i · s(i,j) / √outDim`
    * with `s(i,j) ∈ {±1}` derived from `md5("i|j")` parity — the
    * dimensionality-reduction step in front of ANN indexing and
    * near-dup blocking (distances are preserved within ~√(2/outDim)
    * relative error, so a 64→8 sketch is 8× less shuffle/state for every
    * downstream vector op).
    *
    * The sign matrix is SEED-FREE and engine-derivable: the oracle
    * recomputes it independently from the same md5 rule, rather than
    * trusting a serialized matrix. Per row the projection is `outDim`
    * zip_with/aggregate folds — LEFT-TO-RIGHT array folds, identical in
    * any engine, so no fixed-point scaling is needed (same argument as
    * [[quantizeInt8]]'s mse); rounded to 6 decimals at emit. Narrow map,
    * no shuffle; signs are compile-time literals inside the expression
    * (no per-row hashing).
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    require(inDim > 0 && outDim > 0 && outDim <= inDim,
      s"bad projection dims: $inDim -> $outDim")
    def sign(i: Int, j: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$j".getBytes("UTF-8"))
      val nib = ((d(0) & 0xff) << 8) | (d(1) & 0xff) // first 4 hex chars
      if (nib % 2 == 0) 1d else -1d
    }
    val v = col(vecCol).cast("array<double>")
    val scale = math.sqrt(outDim.toDouble)
    val outs = (0 until outDim).map { j =>
      val sArr = array((0 until inDim).map(i => lit(sign(i, j))): _*)
      round(
        aggregate(zip_with(v, sArr, (x, s) => x * s), lit(0d), (acc, e) => acc + e)
          / scale, 6).as(s"p$j")
    }
    df.select(col(idCol) +: outs: _*)
  }

  /** Random-hyperplane LSH near-dup pairs over embeddings — the third
    * candidate generator beside the exact block-grid
    * ([[cosineDupPairsExact]]) and the centroid-bucketed
    * [[cosineDupPairs]]: sign-of-projection bits ([[randomProject]]'s
    * seed-free ±1 matrix) form an `outDim`-bit signature; vectors
    * meeting in ANY `bandBits`-bit band become candidates (SimHash
    * banding applied to dense vectors — P[bit agrees] = 1 − θ/π, so
    * high-cosine pairs collide in some band w.h.p. while the corpus
    * never self-joins); candidates are verified with exact cosine.
    * Needs NO centroids/training — the trade is probabilistic recall,
    * tuned by (outDim, bandBits). One narrow signature pass, one
    * banded equi-join, one verify join.
    *
    * BUCKET-COUNT MATH (the scale knob — size it before trusting the
    * plan): each band hashes into at most `2^bandBits` buckets, so the
    * candidate self-join's expected bucket population is
    * `n / 2^bandBits` per band. Narrow bands degenerate toward all
    * pairs: at `bandBits = 4` a 10⁹-vector corpus puts ~6×10⁷ vectors
    * in EVERY bucket and the join is O(n²) regardless of how many
    * bands there are. The defaults (`outDim = 64, bandBits = 16`
    * → 4 bands × 65,536 buckets) keep buckets ~n/65k — the 100 TB
    * configuration; recall per band is `(1 − θ/π)^bandBits`, so wide
    * bands trade recall for bucket size and are the right default for
    * near-DUPLICATE detection (θ small → per-band recall stays high).
    * Pass a narrow config explicitly only for small corpora or
    * low-cosine matching, where the quadratic bucket is affordable.
    */
  def lshCosinePairs(df: DataFrame, threshold: Double, inDim: Int,
      outDim: Int = 64, bandBits: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(outDim % bandBits == 0, s"outDim $outDim not banded by $bandBits")
    require(threshold > 0 && threshold <= 1, s"bad threshold $threshold")
    val proj = randomProject(df, idCol, vecCol, inDim, outDim)
    val bits = (0 until outDim).map(j =>
      when(col(s"p$j") > 0, lit("1")).otherwise(lit("0")))
    val sig = proj.select(col(idCol).as("id"), concat(bits: _*).as("sig"))
    val nBands = outDim / bandBits
    val bands = sig.select(col("id"), posexplode(array((0 until nBands).map(b =>
        substring(col("sig"), b * bandBits + 1, bandBits)): _*)).as(Seq("band", "bits")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    val v = withNorm(df, idCol, vecCol, "vid", "vv", "vn")
    cand
      .join(v.select(col("vid").as("id1"), col("vv").as("v1"), col("vn").as("n1")), "id1")
      .join(v.select(col("vid").as("id2"), col("vv").as("v2"), col("vn").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        rounded(cosineWithNorms(col("v1"), col("v2"), col("n1"), col("n2"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * 4× compression for ANN serving / training-data shipping. Per vector:
    * `scale = max(|x_i|) / 127`, `q_i = round(x_i / scale)` ∈ [−127, 127]
    * (zero vectors quantize to zeros, scale 0). Adds `q` (array<int>),
    * `scale` (6-dec rounded) and `mse` — the 6-dec-rounded mean squared
    * reconstruction error, the quality number a pipeline thresholds on.
    *
    * All arithmetic is double IEEE with half-away-from-zero rounding —
    * identical in any engine, so the DuckDB oracle reproduces q
    * element-for-element. Narrow map, no shuffle (the HOFs here are
    * interpreted-eval, acceptable off the per-pair hot paths — this runs
    * once per vector, not per candidate pair).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("s_raw", array_max(transform(col("v"), x => abs(x))) / 127d)
      // CaseWhen evaluates only the selected branch, so the zero-vector
      // row never reaches the division (whose Infinity→int cast would
      // throw under ANSI)
      .withColumn("q", when(col("s_raw") === 0d, transform(col("v"), _ => lit(0)))
        .otherwise(transform(col("v"), x => round(x / col("s_raw"), 0).cast("int"))))
      .withColumn("mse", round(
        when(col("s_raw") === 0d, lit(0d)).otherwise(
          aggregate(
            zip_with(col("v"), col("q"),
              (x, qi) => (x - qi * col("s_raw")) * (x - qi * col("s_raw"))),
            lit(0d), (acc, e) => acc + e) / size(col("v"))), 6))
      .withColumn("scale", round(col("s_raw"), 6))
      .drop("v", "s_raw")

  /** REAL text embedder — the hashing-trick bag-of-tokens featurizer
    * (Weinberger et al., "Feature Hashing for Large Scale Multitask
    * Learning"): each token is feature-hashed into one of `dim` buckets
    * (first 8 md5 hex chars mod dim) with a ±1 sign (parity of the 9th
    * hex char — the unbiasing sign hash from the paper), signed counts
    * are accumulated per bucket, and the vector is L2-normalized and
    * emitted as `array<float>` — exactly the layout every [[Similarity]]
    * ANN/dedup op consumes, so text → [[embedText]] → [[ivfTopK]] /
    * [[cosineDupPairs]] runs end-to-end with no model artifact.
    *
    * Scale shape: a PURE NARROW MAP — zero shuffles, zero state, one md5
    * per token (reused for bucket and sign), then an O(dim · n_tokens)
    * expression fold per row. That per-row constant is the deliberate
    * trade for shuffle-freedom at small `dim` (16–256, the regime here);
    * a wide-`dim` production variant would explode to (id, bucket, sign)
    * and pivot through one groupBy — swap shapes, same semantics.
    *
    * Engine parity (how m6 gates this exactly): bucket counts are exact
    * LONGs, the norm is √(Σc²) computed in double from an exact integer,
    * and each component c/‖c‖ is one double division — bit-identical
    * IEEE ops in both engines — before the final float32 cast, which
    * DuckDB replays as `CAST(x AS REAL)`. Docs with zero tokens (or null
    * text) embed as the zero vector (guarded — no 0/0).
    *
    * The kernel is the native codegen'd [[graft.expr.HashedEmbed]]: the
    * equivalent nested-HOF form (transform · aggregate over a
    * (bucket, sign) struct array) is CodegenFallback and measured
    * ~17 ms/doc interpreted vs sub-ms compiled.
    */
  def embedText(df: DataFrame, dim: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim > 0 && dim <= 4096, s"embedText dim out of range: $dim")
    VecExpressions.register(df.sparkSession)
    df.select(col(idCol).as(idCol),
      coalesce(call_function("hashed_embed", col(textCol), lit(dim)),
        array_repeat(lit(0f), dim)).as("embedding"))
  }

  /** Product-quantization codes: split each `dim`-vector into `m` equal
    * subvectors and encode each as the id of its L2-nearest subspace
    * codeword — the compressed representation ANN indexes (FAISS-style
    * IVFPQ) store instead of raw floats: `m` small ints per vector
    * (here: m codewords from the same deterministic `id % centroidEvery`
    * rule the IVF tier uses; [[trainCentroids]] per subspace is the
    * trained production form).
    *
    * Scale shape: the codebooks are broadcast (m × ncodes × dim/m floats
    * — KBs); each vector explodes to its m subvectors MAP-SIDE and the
    * argmin is the same partial-aggregable groupBy-min as
    * [[assignCells]] keep=1 (rounded distance, codeword-id tiebreak) —
    * the only shuffle carries one row per (vector, subspace), hash-based,
    * no sort. Same determinism discipline: 6-decimal-rounded distances
    * make the argmin engine-exact.
    *
    * @param dim the vector dimensionality (a parameter, not probed with
    *        a driver action — plan builders stay pure).
    * @return (vec_id, sub, code) — `sub` ∈ [0, m), `code` = codeword id.
    */
  def pqCodes(corpus: DataFrame, dim: Int, m: Int, centroidEvery: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    require(m >= 1 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val cb = corpus.filter(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("code"),
        posexplode(array((0 until m).map(j =>
          slice(col(vecCol), j * sub + 1, sub)): _*)).as(Seq("csub", "cvec")))
    corpus
      .select(col(idCol).as("vec_id"),
        posexplode(array((0 until m).map(j =>
          slice(col(vecCol), j * sub + 1, sub)): _*)).as(Seq("sub", "svec")))
      .join(broadcast(cb), col("sub") === col("csub"))
      .select(col("vec_id"), col("sub"),
        struct(rounded(sqrt(l2NativeSq(col("svec"), col("cvec")))).as("d"),
          col("code")).as("cand"))
      .groupBy("vec_id", "sub").agg(min(col("cand")).as("best"))
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        col("best.code").as("code"))
  }

  /** PQ asymmetric-distance top-k (ADC — Jégou et al.'s search side of
    * [[pqCodes]]): queries stay full-precision, the corpus is its m
    * one-byte-per-subspace codes, and each query precomputes a DISTANCE
    * TABLE (query-slice → every codebook entry, per subspace); a corpus
    * vector's approximate distance is then m table lookups summed —
    * never a float op against the corpus itself. This is what makes
    * billion-vector search scan-bound instead of FLOP-bound: the big
    * side touched per (query, vector) is m small-int lookups.
    *
    * Distributed shape: the distance table is |queries|·m·|codebook|
    * rows, BROADCAST; the codes frame (the only big relation) joins it
    * on the (sub, code) equi-key and one partial-aggregable LONG sum
    * per (query, vector) produces the ranking key. Table cells are
    * quantized to integer micro-units at build (`round(l2²·10⁶)`) so
    * the per-vector sum is order-free exact integer arithmetic — the
    * cross-engine determinism rule — and ranking ties break on id.
    * Compose with [[ivfTopK]]'s cells for the full IVFADC layout.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, dim: Int, m: Int,
      centroidEvery: Int, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    require(m >= 1 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val codes = pqCodes(corpus, dim, m, centroidEvery, idCol, vecCol)
    val cb = corpus.filter(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("code"),
        posexplode(array((0 until m).map(j =>
          slice(col(vecCol), j * sub + 1, sub)): _*)).as(Seq("csub", "cvec")))
    val qs = queries.select(col(idCol).as("query_id"),
      posexplode(array((0 until m).map(j =>
        slice(col(vecCol), j * sub + 1, sub)): _*)).as(Seq("qsub", "qvec")))
    val dt = qs.join(broadcast(cb), col("qsub") === col("csub"))
      .select(col("query_id"), col("qsub").cast("long").as("sub"), col("code"),
        round(l2NativeSq(col("qvec"), col("cvec")) * 1e6, 0).cast("long").as("d_micro"))
    val scored = codes.join(broadcast(dt), Seq("sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id").as("nn_id"))
      .agg(sum(col("d_micro")).as("approx_d_micro"))
    val w = Window.partitionBy("query_id").orderBy(col("approx_d_micro"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("approx_d_micro"))
  }

  /** FULL IVFADC (Jégou et al.'s complete layout — the billion-vector
    * index shape): the coarse quantizer restricts each query to its
    * `nprobe` nearest IVF cells, and ONLY vectors in those cells pay the
    * ADC table-lookup distance. This is the piece [[pqTopK]] leaves out
    * (it ADC-scans the whole corpus): cell restriction is what turns the
    * scan-bound ADC pass into a `nprobe/ncells` fraction of the corpus.
    *
    * Distributed shape, split exactly as a production index splits it:
    *   - INDEX BUILD (once, stored): cell assignment (broadcast
    *     centroids, partial-aggregable argmin) + PQ codes, joined into
    *     the cell-tagged codes artifact — the ONE keyed shuffle, in
    *     production materialized as a table partitioned by `cent_id`.
    *   - SERVING (per query batch): probes (|queries|·nprobe rows) and
    *     the distance table broadcast; the codes artifact is probed
    *     map-side — rows outside probed cells die at the broadcast-hash
    *     join, never reaching the final partial-aggregable sum. No
    *     corpus shuffle at query time.
    *
    * Same determinism as [[pqTopK]] (integer micro-unit ADC cells,
    * order-free LONG sums, id tiebreaks) plus [[ivfTopK]]'s rounded-L2
    * cell argmin — every stage SQL-replayable. The coarse quantizer runs
    * on the FULL vector; the PQ codes on the `codedDim` prefix (the
    * sim9/sim11 contract).
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, codedDim: Int, m: Int,
      centroidEvery: Int, nprobe: Int, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    VecExpressions.register(corpus.sparkSession)
    require(m >= 1 && codedDim % m == 0, s"codedDim $codedDim not divisible into $m subspaces")
    val sub = codedDim / m
    val cents = corpus.filter(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_vec"))
    val cells = assignCells(
        withNorm(corpus, idCol, vecCol, "vec_id", "nn_vec", "nn_nrm"),
        cents, "vec_id", "nn_vec", "nn_nrm", 1)
      .select(col("vec_id"), col("cent_id"))
    val probes = assignCells(
        withNorm(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm"),
        cents, "query_id", "q_vec", "q_nrm", nprobe)
      .select(col("query_id"), col("cent_id"))
    val codesC = pqCodes(corpus, codedDim, m, centroidEvery, idCol, vecCol)
      .join(cells, "vec_id")
    val cb = corpus.filter(col(idCol) % centroidEvery === 0)
      .select(col(idCol).as("code"),
        posexplode(array((0 until m).map(j =>
          slice(col(vecCol), j * sub + 1, sub)): _*)).as(Seq("csub", "cvec")))
    val qs = queries.select(col(idCol).as("query_id"),
      posexplode(array((0 until m).map(j =>
        slice(col(vecCol), j * sub + 1, sub)): _*)).as(Seq("qsub", "qvec")))
    val dt = qs.join(broadcast(cb), col("qsub") === col("csub"))
      .select(col("query_id"), col("qsub").cast("long").as("sub"), col("code"),
        round(l2NativeSq(col("qvec"), col("cvec")) * 1e6, 0).cast("long").as("d_micro"))
    val scored = codesC.join(broadcast(probes), "cent_id")
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(dt), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id").as("nn_id"))
      .agg(sum(col("d_micro")).as("approx_d_micro"))
    val w = Window.partitionBy("query_id").orderBy(col("approx_d_micro"), col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("approx_d_micro"))
  }

  /** PQ shortlist → exact re-rank — the standard billion-vector serving
    * composition (FAISS `IndexRefineFlat` over IVFADC): the cheap
    * asymmetric-distance scan ([[pqTopK]]) cuts the corpus to a
    * per-query shortlist of `shortlist` candidates, and only those
    * candidates pay a full-precision cosine against the query before the
    * final top-`k`. ADC compresses aggressively (here: the first `dim`
    * components in m one-byte codes), so its ranking is approximate near
    * the cut line; re-ranking the shortlist with exact arithmetic
    * recovers full-precision ordering while touching `shortlist/|corpus|`
    * of the data at full width.
    *
    * Distributed shape: the shortlist is |queries|·shortlist id pairs —
    * KBs — and is BROADCAST to the corpus scan, so the re-rank pass is
    * one narrow corpus read with a broadcast-hash probe (plan-locked: no
    * corpus shuffle, no nested loop); queries broadcast as in
    * [[bruteForceTopK]]. The corpus is scanned three times, all narrow:
    * the codebook filter (`id % centroidEvery` inside [[pqCodes]]), the
    * coding pass, and the re-rank fetch — exactly as a production index
    * builds its codebook and codes as prebuilt artifacts and fetches raw
    * vectors only for shortlist hits.
    *
    * Determinism: the shortlist replays [[pqTopK]]'s integer micro-unit
    * ADC ranking; re-rank cosines are 6-decimal-rounded before ranking
    * with id tiebreaks (the module rule), so both stages are
    * reproducible bit-for-bit in SQL.
    *
    * @param codedDim the PQ-coded PREFIX width — the leading `codedDim`
    *        vector components that [[pqCodes]] slices into `m` subspaces
    *        for the shortlist stage (16 in the sim12 gate, against wider
    *        embeddings). NOT the full vector dimensionality: components
    *        past the prefix skip coding but still count in the exact
    *        re-rank cosine, which always runs full-width. Must divide
    *        into `m`, and must not exceed the shortest vector (Spark's
    *        `slice` would silently truncate).
    */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, codedDim: Int, m: Int,
      centroidEvery: Int, shortlist: Int, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val short = pqTopK(corpus, queries, codedDim, m, centroidEvery, shortlist,
        idCol, vecCol)
      .select(col("query_id"), col("nn_id"))
    val c = withNorm(corpus, idCol, vecCol, "nn_id", "nn_vec", "nn_nrm")
    val q = withNorm(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm")
    val exact = c.join(broadcast(short), Seq("nn_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("nn_id"),
        rounded(cosineWithNorms(col("q_vec"), col("nn_vec"),
          col("q_nrm"), col("nn_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("nn_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cosine"))
  }

  /** Maximal-Marginal-Relevance diverse top-k — the retrieval reranker
    * that trades raw relevance against redundancy: greedily select
    * `score = λ·rel(q, d) − (1−λ)·max_{s∈selected} sim(d, s)`, so the
    * second pick is pushed away from the first instead of being its
    * near-duplicate (the standard diversity pass over an ANN candidate
    * pool before context assembly).
    *
    * The greedy recurrence is inherently sequential in k but fully
    * distributed in the corpus: relevance is ONE broadcast-queries pass
    * (as [[bruteForceTopK]]), then each of the k rounds joins candidates
    * against the ≤ k·|queries|-row selected set (broadcast), takes a
    * per-query `row_number` argmax, and appends one winner per query.
    * k driver-blind rounds of narrow work — corpus rows never shuffle;
    * `localCheckpoint` pins the relevance frame so the k rounds re-read
    * it instead of re-scoring the corpus. In production, feed this a
    * pre-cut ANN pool ([[ivfTopK]] output), not the whole corpus.
    *
    * Determinism: every cosine is 6-decimal-rounded before the max/argmax
    * (the module rule), λ enters as integer percent so both engines parse
    * identical doubles (`lamPct/100.0`), scores re-round to 6, ties break
    * on candidate id. Round 1's score is raw relevance (nothing selected
    * yet to repel from).
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, k: Int, lamPct: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(lamPct >= 0 && lamPct <= 100, s"lamPct out of [0,100]: $lamPct")
    val c = withNorm(corpus, idCol, vecCol, "cand_id", "c_vec", "c_nrm")
    val q = withNorm(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm")
    val rel = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("c_vec"), col("c_nrm"),
        rounded(cosineWithNorms(col("q_vec"), col("c_vec"), col("q_nrm"), col("c_nrm"))).as("rel"))
      .localCheckpoint()
    val lam = lit(lamPct) / 100.0
    val oneMinusLam = lit(100 - lamPct) / 100.0
    val pickW = Window.partitionBy("query_id").orderBy(desc("score"), col("cand_id"))
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val scored =
        if (r == 1)
          rel.select(col("query_id"), col("cand_id"), col("rel").as("score"))
        else {
          val sel = selected.select(col("query_id"), col("sel_id"),
            col("s_vec"), col("s_nrm"))
          rel.join(broadcast(sel), Seq("query_id"))
            .filter(col("cand_id") =!= col("sel_id"))
            .select(col("query_id"), col("cand_id"), col("rel"),
              rounded(cosineWithNorms(col("c_vec"), col("s_vec"), col("c_nrm"), col("s_nrm"))).as("sim"))
            .groupBy("query_id", "cand_id", "rel")
            .agg(max(col("sim")).as("ms"), count(lit(1)).as("n_sel"))
            // a candidate missing a sim row IS a selected one — the
            // inner count check keeps only true candidates
            .filter(col("n_sel") === lit(r - 1))
            .select(col("query_id"), col("cand_id"),
              round(lam * col("rel") - oneMinusLam * col("ms"), 6).as("score"))
        }
      val pick = scored.withColumn("rn", row_number().over(pickW))
        .filter(col("rn") === 1)
        .select(col("query_id"), lit(r.toLong).as("sel_round"),
          col("cand_id").as("sel_id"), col("score"))
      val pickV = pick.join(
        c.select(col("cand_id").as("sel_id"), col("c_vec").as("s_vec"),
          col("c_nrm").as("s_nrm")), "sel_id")
        .select(col("query_id"), col("sel_round"), col("sel_id"),
          col("score"), col("s_vec"), col("s_nrm"))
        .localCheckpoint()
      selected = if (selected == null) pickV else selected.unionByName(pickV)
    }
    selected.select(col("query_id"), col("sel_round"), col("sel_id"), col("score"))
  }
}
