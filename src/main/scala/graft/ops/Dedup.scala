package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** MinHash signature: `k` independent permutations approximated by
    * salted md5 — sig_i = min over shingles of md5("<i>:" + shingle).
    * Lexicographic min over uniformly-distributed hex strings ≡ min-hash.
    * Pure array expressions → computed map-side, no shuffle, and identical
    * in any engine with md5.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, s => md5(concat(lit(s"$i:"), s).cast("binary"))))
    }: _*)

  /** LSH band hashes: group the `k` signature values into bands of `r`,
    * hash each band. Docs sharing any band hash become candidate pairs —
    * the only shuffle key in the at-scale near-dup join.
    */
  def lshBands(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, s"k=$k not divisible by band size r=$r")
    array((0 until k / r).map { j =>
      md5(concat_ws("|", (0 until r).map(i => element_at(sig, j * r + i + 1)): _*).cast("binary"))
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

  /** All candidate near-dup pairs by exact n-gram Jaccard ≥ threshold.
    * Candidates = pairs sharing at least one shingle (exploded self-join on
    * the shingle — correct but worst-case quadratic; see [[minhashDupPairs]]
    * for the sketch path).
    */
  /** Distinct (id, shingle) rows via posexplode + window lead — semantically
    * identical to `explode(wordShingles(...))` but with only simple
    * expressions in the plan: the nested higher-order-function form costs
    * ~70 s of whole-stage codegen compilation per query shape (measured),
    * while this form compiles instantly. The window shuffle is by doc id
    * over bounded-length docs — cheap at any scale.
    */
  def explodedShingles(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy("id").orderBy("pos")
    val parts = col("tok") +: (1 until n).map(i => lead("tok", i).over(w))
    toks
      .withColumn("s", when(parts.last.isNotNull, concat_ws(" ", parts: _*)))
      .filter(col("s").isNotNull)
      .select(col("id"), col("s")).distinct()
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

  /** Near-dup pairs via MinHash + LSH banding, verified with exact Jaccard.
    * The shuffle is on (band index, band hash) — at 100 TB this is the only
    * wide edge, and bucket sizes stay bounded because a band collision
    * already implies high similarity.
    */
  def minhashDupPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int, r: Int, threshold: Double): DataFrame = {
    require(k % r == 0, s"k=$k not divisible by band size r=$r")
    val ex = explodedShingles(df, textCol, idCol, n)
    // All k salted hashes as ONE map-side array column, then k cheap
    // elementwise `min` aggregates (plus the shingle count, folded into the
    // same pass — no separate `sizes` aggregation). Keeping the md5s in a
    // Project and the aggregate update trivial matters: inlining
    // `min(md5(concat(...)))` ×k into one HashAggregate generated a
    // JIT-hostile update method that ran erratically 2–30× slower
    // (measured 7–211 s for identical runs at sf0.1; this shape is a
    // stable ~3 s). Still partial map-side mins and one shuffle on id.
    val hs = array((0 until k).map(i =>
      md5(concat(lit(s"$i:"), col("s")).cast("binary"))): _*)
    val exH = ex.select(col("id"), hs.as("hs"))
    val sigAggs = (0 until k).map(i =>
      min(element_at(col("hs"), i + 1)).as(s"h$i")) :+ count(lit(1)).as("n_sh")
    val sigs = exH.groupBy("id").agg(sigAggs.head, sigAggs.tail: _*)
    val bandArr = array((0 until k / r).map { j =>
      md5(concat_ws("|", (0 until r).map(i => col(s"h${j * r + i}")): _*).cast("binary"))
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
    // verify candidates only: |A ∩ B| by shared-shingle count restricted to
    // the candidate set (broadcast — band collisions are rare by design),
    // then J = c / (n1 + n2 − c)
    ex.select(col("id").as("id1"), col("s"))
      .join(broadcast(cand), "id1")
      .join(ex.select(col("id").as("id2"), col("s")), Seq("id2", "s"))
      .groupBy("id1", "id2", "n1", "n2").agg(count(lit(1)).as("c"))
      .select(col("id1"), col("id2"),
        (col("c").cast("double") / (col("n1") + col("n2") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
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

  /** SimHash sketches as an exploded-token aggregate: one md5 per token
    * total (the array-expression form [[simhash16]] re-evaluates the token
    * hash list once per bit reference — ~33 folds per row, measured as the
    * entire runtime at bench scale), with map-side partial sums and one
    * shuffle on id. Docs with zero tokens get sk = 0 (the bit rule's
    * `2·ones > len` is false at len 0), preserved via the left join.
    */
  def simhashSketch(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).as("id"))
    val h = conv(substring(md5(col("tok").cast("binary")), 1, 4), 16, 10).cast("int")
    val ex = df.select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("id"), h.as("h"))
    val bitAggs = (0 until 16).map(j =>
      sum(when(col("h").bitwiseAND(lit(1 << j)) =!= 0, 1).otherwise(-1)).as(s"b$j"))
    val sk = (0 until 16).map(j => when(col(s"b$j") > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)
    val sketches = ex.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"), sk.as("sk"))
    ids.join(sketches, Seq("id"), "left")
      .select(col("id"), coalesce(col("sk"), lit(0)).as("sk"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist (all-pairs
    * baseline; the scale path blocks on sketch bytes first).
    */
  def simhashDupPairs(df: DataFrame, textCol: String, idCol: String, maxDist: Int): DataFrame = {
    val base = simhashSketch(df, textCol, idCol)
    // all-pairs = nested-loop join whose parallelism is the stream side's
    // partition count — repartition so a single-file source still fans out
    // across the cluster (one task per shuffle partition, broadcast build)
    val stream = base.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    stream.as("a").join(broadcast(base.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.sk").bitwiseXOR(col("b.sk"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
