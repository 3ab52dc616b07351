package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("wordShingles: distinct trigrams; short docs → empty") {
    import spark.implicits._
    val r = docs((1L, "a b c d a b c d"), (2L, "a b"))
      .select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(r(0)._2 == Seq("a b c", "b c d", "c d a", "d a b")) // distinct, first-occurrence
    assert(r(1)._2.isEmpty)
  }

  test("incrementalDedupBloom == incrementalDedup; the bloom really prunes") {
    import spark.implicits._
    val hist = (0 until 200).map(i => (i.toLong, s"history doc number $i words"))
      .toDF("doc_id", "text")
    val fresh = ((0 until 10).map(i => (1000L + i, s"history doc number $i words")) ++ // dups
      (0 until 90).map(i => (2000L + i, s"entirely new content $i here")))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val plain = norm(Dedup.incrementalDedup(hist, fresh, "text", "doc_id"))
    val bloom = norm(Dedup.incrementalDedupBloom(hist, fresh, "text", "doc_id",
      expectedItems = 1000L))
    assert(bloom == plain, "bloom prefilter changed the result")
    assert(plain.count(_._3) == 10)
    // at 1% fpp nearly all 90 new docs must be rejected map-side
    val b = hist.select(graft.functions.TextFunctions.fingerprintMd5(col("text")).as("f"))
      .stat.bloomFilter("f", 1000L, 0.01)
    val freshFps = fresh.select(graft.functions.TextFunctions.fingerprintMd5(col("text")).as("f"))
      .collect().map(_.getString(0))
    val pruned = freshFps.count(fp => !b.mightContainString(fp))
    assert(pruned >= 80, s"bloom pruned only $pruned of 90 new docs")
  }

  test("incrementalDedupBloom: null-text fresh rows don't NPE and match plain op") {
    import spark.implicits._
    val hist = Seq((1L, "some history doc"), (2L, "another history doc"))
      .toDF("doc_id", "text")
    val fresh = Seq((10L, "some history doc"), (11L, null), (12L, "brand new doc"))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2))).toSet
    val plain = norm(Dedup.incrementalDedup(hist, fresh, "text", "doc_id"))
    val bloom = norm(Dedup.incrementalDedupBloom(hist, fresh, "text", "doc_id",
      expectedItems = 100L))
    assert(bloom == plain, "null-text row diverged between bloom and plain")
    assert(plain.exists { case (id, fp, dup) => id == 11L && fp.isEmpty && !dup })
  }

  test("editDistanceCapStats reports exactly the blocks the pairing pass drops") {
    // planted boilerplate: 5 docs share a 16-char prefix (over cap=3);
    // a 2-doc block stays under the cap and still pairs
    val boiler = "click here now!!"
    assert(boiler.length == 16)
    val df = docs(
      (1L, boiler + " tail one"), (2L, boiler + " tail two"),
      (3L, boiler + " tail tri"), (4L, boiler + " tail for"),
      (5L, boiler + " tail fiv"),
      (10L, "unique prefix aa doc body x"), (11L, "unique prefix aa doc body y"))
    val stats = Dedup.editDistanceCapStats(df, "text", "doc_id",
      prefixLen = 16, maxBlock = 3).collect()
    assert(stats.length == 1 && stats(0).getLong(1) == 5L,
      s"expected one dropped block of 5 rows, got ${stats.mkString(",")}")
    val pairs = Dedup.editDistanceDupPairs(df, "text", "doc_id",
      prefixLen = 16, maxDist = 5, maxBlock = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the under-cap block pairs; none of ids 1-5 appear
    assert(pairs == Set((10L, 11L)), pairs.toString)
  }

  test("substringSpans recovers the exact shared run and offsets") {
    // doc2 carries doc1's tokens 3..12 (10 tokens: c3..c12) at offset 3
    val shared = (3 to 12).map(i => s"c$i").mkString(" ")
    val r = Dedup.substringSpans(docs(
        (1L, (1 to 20).map(i => s"c$i").mkString(" ")),
        (2L, s"x y $shared q r s t")),
      "text", "doc_id", n = 4, minLen = 8).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("id1") == 1L && row.getAs[Long]("id2") == 2L)
    assert(row.getAs[Long]("start1") == 3L, "span start in doc1")
    assert(row.getAs[Long]("start2") == 3L, "span start in doc2")
    assert(row.getAs[Long]("span_len") == 10L, "exact shared run length")
    // a full-doc 6-token dup: reported at minLen=6, silent at minLen=8
    val sixDup = docs((1L, "a b c d e f"), (2L, "a b c d e f"))
    val six = Dedup.substringSpans(sixDup, "text", "doc_id", n = 4, minLen = 6).collect()
    assert(six.length == 1 && six.head.getAs[Long]("span_len") == 6L)
    assert(Dedup.substringSpans(sixDup, "text", "doc_id", n = 4, minLen = 8).count() == 0)
  }

  test("substringSpans anchor-frequency cap drops boilerplate runs only") {
    // the same 8-token header in every doc (boilerplate); docs 1 and 2
    // additionally share a unique 8-token body run
    val header = "standard license header tokens one two three four"
    val body = "unique shared body content alpha beta gamma delta"
    val d = docs(
      (1L, s"$header $body"), (2L, s"$header $body"),
      (3L, s"$header other text entirely here now today ok"),
      (4L, s"$header more unrelated words in this doc too"))
    // uncapped: header matches across all 6 pairs; capped at 4 occurrences
    // (header anchors occur 4x, body anchors 2x) header survives; cap at 3
    // kills header pairs, keeps the unique body span between 1 and 2
    // 6 pairs: (1,2) one merged header+body run of 16; the other 5 share
    // the 8-token header only
    val uncapped = Dedup.substringSpans(d, "text", "doc_id", 8, 8).collect()
    assert(uncapped.length == 6)
    assert(uncapped.count(_.getAs[Long]("span_len") == 16L) == 1)
    val capped = Dedup.substringSpans(d, "text", "doc_id", 8, 8, maxAnchorOcc = 3)
      .collect()
    assert(capped.length == 1)
    assert(capped.head.getAs[Long]("id1") == 1L && capped.head.getAs[Long]("id2") == 2L)
  }

  test("exactDedup groups identical normalized text") {
    val r = Dedup.exactDedup(docs((1L, "Hello  World"), (2L, "hello world"), (3L, "other")),
      "text", "doc_id").orderBy("keep_id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_dups") == 2 && r(0).getAs[Long]("keep_id") == 1L)
  }

  test("jaccardDupPairs finds the planted near-dup only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words in this one nothing shared at all here"
    val r = Dedup.jaccardDupPairs(docs((1L, base), (2L, near), (3L, far)),
      "text", "doc_id", 3, 0.5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("id1") == 1L && r(0).getAs[Long]("id2") == 2L)
    assert(r(0).getAs[Double]("jaccard") > 0.6)
  }

  test("threshold sweep over one pair table declines with graded similarity") {
    // three pairs engineered at distinct Jaccard levels: ~0.93 (one word
    // of 15 changed), ~0.72 (three words changed), ~0.55 (five changed)
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"
    val corpus = docs(
      (1L, base), (2L, base.replace("w15", "x")),
      (3L, base), (4L, base.replace("w1 w2 w3", "x1 x2 x3")),
      (5L, base), (6L, base.replace("w1 w2 w3 w4 w5", "x1 x2 x3 x4 x5")))
    // NOTE docs 1/3/5 are identical (jaccard 1.0) — count only the
    // engineered cross pairs at each cut
    val pairs = Dedup.jaccardDupPairs(corpus, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def yieldAt(t: Double) = pairs.count(_._3 >= t)
    val curve = Seq(0.5, 0.7, 0.9).map(yieldAt)
    assert(curve(0) > curve(1) && curve(1) > curve(2),
      s"curve should strictly decline on graded corpus: $curve / ${pairs.toSeq}")
  }

  test("containmentDupPairs catches an embedded doc that Jaccard misses") {
    val big = (1 to 40).map(i => s"word$i").mkString(" ")
    val small = (10 to 16).map(i => s"word$i").mkString(" ") // fully inside big
    val corpus = docs((1L, big), (2L, small),
      (3L, "entirely different content with nothing shared at all in it"))
    val cont = Dedup.containmentDupPairs(corpus, "text", "doc_id", 3, 0.9).collect()
    assert(cont.length == 1)
    assert(cont(0).getAs[Long]("id1") == 1L && cont(0).getAs[Long]("id2") == 2L)
    assert(cont(0).getAs[Double]("containment") == 1.0) // all 5 trigram shingles shared
    // the same pair is invisible to Jaccard at any useful threshold
    val jac = Dedup.jaccardDupPairs(corpus, "text", "doc_id", 3, 0.5).collect()
    assert(jac.isEmpty)
  }

  test("prefixJaccardPairs == jaccardDupPairs (lossless filter) on varied docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = docs(
      (1L, base), (2L, base.replace("today", "tomorrow")),
      (3L, "completely different words in this one nothing shared at all here"),
      (4L, base), // exact duplicate of 1
      (5L, "the quick brown fox sentence shares a few shingles with the base"),
      (6L, "another unrelated document that talks about sampling and windows"))
    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Double]("jaccard"))).toSet
    val exact = pairs(Dedup.jaccardDupPairs(corpus, "text", "doc_id", 3, 0.5))
    val pref = pairs(Dedup.prefixJaccardPairs(corpus, "text", "doc_id", 3, 0.5))
    assert(pref == exact && exact.nonEmpty, s"prefix=$pref exact=$exact")
    // and at a lower threshold (longer prefixes, more candidates)
    val exactLo = pairs(Dedup.jaccardDupPairs(corpus, "text", "doc_id", 3, 0.2))
    val prefLo = pairs(Dedup.prefixJaccardPairs(corpus, "text", "doc_id", 3, 0.2))
    assert(prefLo == exactLo, s"prefix=$prefLo exact=$exactLo")
  }

  test("adaptiveJaccardPairs picks the branch the shingle-df shape demands; both exact") {
    // dup-sparse corpus (the d2 fixture shape): candidate blowup ≈ input
    // rows → the all-pairs branch (no row_number ranking in the plan)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val sparse = docs(
      (1L, base), (2L, base.replace("today", "tomorrow")),
      (3L, "completely different words in this one nothing shared at all here"),
      (4L, "another unrelated document that talks about sampling and windows"))
    val aSparse = Dedup.adaptiveJaccardPairs(sparse, "text", "doc_id", 3, 0.5)
    assert(!aSparse.queryExecution.optimizedPlan.toString.contains("row_number"),
      "dup-sparse corpus should select the all-pairs branch")
    // Zipf-heavy corpus: every doc shares two head shingles, so the
    // all-pairs join would emit 2·C(60,2) candidate rows against ~300
    // input rows → the prefix branch (row_number prefix ranking present)
    val zipf = docs((1 to 60).map(i =>
      (i.toLong, s"alpha beta gamma delta unique$i tail$i words$i")) ++
      Seq((61L, base), (62L, base)): _*)
    val aZipf = Dedup.adaptiveJaccardPairs(zipf, "text", "doc_id", 3, 0.5)
    assert(aZipf.queryExecution.optimizedPlan.toString.contains("row_number"),
      "Zipf-heavy corpus should select the prefix branch")
    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Double]("jaccard"))).toSet
    assert(pairs(aSparse) == pairs(Dedup.jaccardDupPairs(sparse, "text", "doc_id", 3, 0.5)))
    val exactZipf = pairs(Dedup.jaccardDupPairs(zipf, "text", "doc_id", 3, 0.5))
    assert(pairs(aZipf) == exactZipf && exactZipf.contains((61L, 62L, 1.0)),
      "prefix branch must reproduce the exact all-pairs answer")
  }

  test("minhash LSH candidates include exact duplicates (identical signatures)") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val r = Dedup.minhashDupPairs(docs((1L, base), (2L, base), (3L, "unrelated text entirely about other things completely")),
      "text", "doc_id", 3, 12, 3, 0.5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("jaccard") == 1.0)
  }

  test("simhashSketch (exploded agg) == simhash16 (array expr) on real docs") {
    import spark.implicits._
    val docs500 = spark.read.parquet(s"$sf0001/documents.parquet")
    val arrForm = docs500.select(col("doc_id").as("id"), Dedup.simhash16(col("text")).as("sk_arr"))
    val aggForm = Dedup.simhashSketch(docs500, "text", "doc_id")
    val diff = arrForm.join(aggForm, "id").filter(col("sk_arr") =!= col("sk")).count()
    assert(diff == 0)
  }

  test("simhash: identical docs at distance 0") {
    val r = Dedup.simhashDupPairs(docs((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota kappa")), "text", "doc_id", 0).collect()
    assert(r.exists(x => x.getAs[Long]("id1") == 1L && x.getAs[Long]("id2") == 2L &&
      x.getAs[Int]("hamming") == 0))
  }

  test("incrementalMinhashDupPairs: verbatim re-arrival matches at J=1, novel doc stays silent") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val hist = docs((1L, base), (2L, "unrelated history content about other topics entirely different"))
    val fresh = docs((100L, base),
      (101L, "completely novel fresh words sharing nothing with any history document"))
    val r = Dedup.incrementalMinhashDupPairs(hist, fresh, "text", "doc_id", 3, 12, 3, 0.5)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("fresh_id") == 100L && r(0).getAs[Long]("hist_id") == 1L)
    assert(r(0).getAs[Double]("jaccard") == 1.0)
  }

  test("incrementalMinhashDupPairs: precomputed history signatures give identical results") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val hist = docs((1L, base), (2L, "some other historical text with enough tokens to shingle fully"))
    val fresh = docs((100L, base.replace("today", "tomorrow")))
    def run(sigs: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.incrementalMinhashDupPairs(hist, fresh, "text", "doc_id", 3, 12, 3, 0.5, sigs)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    val artifact = Dedup.minhashSignatures(hist, "text", "doc_id", 3, 12)
    assert(run(None) == run(Some(artifact)))
    assert(run(None).nonEmpty)
  }

  private def ccOf(nodeIds: Seq[Long], edges: Seq[(Long, Long)],
      parts: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    val n = nodeIds.toDF("id").repartition(parts)
    val e = edges.toDF("src", "dst").repartition(parts)
    Dedup.dupClusters(n, e, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("dupClusters: chain, clique, and singleton resolve to min-id components") {
    // chain 1-2-3-4-5 (diameter 4 → several propagation rounds), clique
    // {10,11,12}, singleton 20; edge direction must not matter
    val cc = ccOf(Seq(1, 2, 3, 4, 5, 10, 11, 12, 20),
      Seq((2, 1), (2, 3), (4, 3), (4, 5), (10, 11), (11, 12), (12, 10)))
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(cc(20L) == 20L)
  }

  test("dupClusters: result is partitioning-independent") {
    val edges = (1L to 40L).filter(_ % 4 != 0).map(i => (i, i + 1))
    val a = ccOf(1L to 41L, edges, parts = 2)
    val b = ccOf(1L to 41L, edges, parts = 13)
    assert(a == b)
    assert(a(3L) == 1L && a(5L) == 5L) // 4-node runs starting at 1,5,9,...
  }

  test("dupClusters: transitive closure of exactDedup pairs keeps one survivor per group") {
    // a~b and b~c but never a~c directly: pairs from shared fingerprints
    // via different salts would miss transitivity without the closure
    val cc = ccOf(Seq(1, 2, 3), Seq((1, 2), (2, 3)))
    assert(cc.values.toSet == Set(1L))
  }

  private def starCcOf(nodeIds: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.dupClustersStar(nodeIds.toDF("id").repartition(3),
        edges.toDF("src", "dst").repartition(3), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("dupClustersStar == dupClusters on chains, cliques, stars, random graphs") {
    val rnd = new scala.util.Random(42) // fixed seed: deterministic fixture
    val shapes: Seq[(Seq[Long], Seq[(Long, Long)])] = Seq(
      // 20-node chain + clique + singleton
      ((1L to 26L), (1L to 19L).map(i => (i, i + 1)) ++
        Seq((21L, 22L), (22L, 23L), (23L, 21L))),
      // random sparse graph, 60 nodes / 40 edges (duplicates + self-ids ok)
      ((1L to 60L), Seq.fill(40)((rnd.nextInt(60) + 1L, rnd.nextInt(60) + 1L))),
      // empty edge set: all singletons
      ((1L to 5L), Seq.empty)
    )
    for (((nodes, edges), i) <- shapes.zipWithIndex) {
      val a = starCcOf(nodes, edges.filter(e => e._1 != e._2))
      val b = ccOf(nodes, edges.filter(e => e._1 != e._2))
      assert(a == b, s"shape $i: star and propagation disagree")
    }
  }

  test("dupClustersStar converges in far fewer rounds than the diameter") {
    // a 200-node path (diameter 199): label propagation would need ~200
    // rounds; the star alternation must land well inside 30 cycles (the
    // default bound) — this is the op's reason to exist
    val cc = starCcOf(1L to 200L, (1L to 199L).map(i => (i, i + 1)))
    assert(cc.values.toSet == Set(1L))
  }

  test("softDedupWeights: 1/|cluster| micro weights; influence conserved") {
    import spark.implicits._
    // clusters: {1,2,3} (size 3), {4,5} (size 2), {6} (singleton)
    val clustered = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L)).toDF("doc_id", "cluster_id").repartition(3)
    val r = Dedup.softDedupWeights(clustered, "doc_id", "cluster_id")
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L), (3L, 1L, 3L, 333333L),
      (4L, 4L, 2L, 500000L), (5L, 4L, 2L, 500000L),
      (6L, 6L, 1L, 1000000L)))
    // conservation: Σ weights == #clusters (to within micro rounding:
    // each cluster contributes 1e6 ± cluster_size/2 micro-units)
    val total = r.map(_._4).sum
    assert(math.abs(total - 3L * 1000000L) <= r.length / 2 + 3)
  }
}

class SimilaritySpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("native vec_dot/vec_l2sq match the HOF forms bit-for-bit on real embeddings") {
    import graft.functions.VectorFunctions._
    graft.expr.VecExpressions.register(spark)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("id1"), col("embedding").as("v1")).filter(col("id1") < 30)
      .crossJoin(e.select(col("vec_id").as("id2"), col("embedding").as("v2")).filter(col("id2").between(30, 60)))
    val diff = pairs.select(
      dot(col("v1"), col("v2")).as("hof"), dotNative(col("v1"), col("v2")).as("nat"),
      l2Distance(col("v1"), col("v2")).as("l2hof"), sqrt(l2NativeSq(col("v1"), col("v2"))).as("l2nat"))
      .filter(col("hof") =!= col("nat") || col("l2hof") =!= col("l2nat")).count()
    assert(diff == 0)
  }

  test("bruteForceTopK ranks by cosine, self excluded") {
    val v = vecs(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f)))
    val r = Similarity.bruteForceTopK(v, v.filter(col("vec_id") === 0), 2)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("nn_id")).toSeq == Seq(1L, 2L))
    assert(r(0).getAs[Double]("cosine") > 0.99)
  }

  test("hardNegativeMine: label laws, rank order, margins vs brute-force truth") {
    import spark.implicits._
    val v = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.95f, 0.05f), 0), (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0.8f, 0.2f), 1), (4L, Seq(0f, 1f), 2), (5L, Seq(-1f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val labels = Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2)
    val got = Similarity.hardNegativeMine(v, v.filter(col("vec_id") === 0), 3)
      .orderBy("rank").collect()
    // negatives are the nearest OTHER-label vectors in cosine order
    assert(got.map(_.getAs[Long]("neg_id")).toSeq == Seq(2L, 3L, 4L))
    assert(got.forall(r => labels(r.getAs[Long]("neg_id")) != 0))
    // the positive is the nearest SAME-label vector, shared by all ranks
    assert(got.map(_.getAs[Long]("pos_id")).toSet == Set(1L))
    // margins: pos_cos − neg_cos in micro units, negative = active triplet
    val truth = Similarity.bruteForceTopK(v, v.filter(col("vec_id") === 0), 5)
      .collect().map(r => r.getAs[Long]("nn_id") -> r.getAs[Double]("cosine")).toMap
    got.foreach { r =>
      val want = math.round((truth(1L) - truth(r.getAs[Long]("neg_id"))) * 1e6)
      assert(r.getAs[Long]("margin_micro") == want)
    }
    // a query whose label is unique → null positive, negatives intact
    val lone = Similarity.hardNegativeMine(
      v.filter(col("vec_id") =!= 1L), v.filter(col("vec_id") === 0), 2)
      .orderBy("rank").collect()
    assert(lone.length == 2 && lone.forall(_.isNullAt(4)) &&
      lone.forall(_.isNullAt(6)))
  }

  test("pqTopK with a per-vector codebook degenerates to exact L2 ranking") {
    // centroidEvery=1: every vector is its own code, so the ADC lookup
    // sum IS the true squared distance (per-subspace micro-rounded)
    val v = vecs((0L until 12L).map(i =>
      (i, Seq(i * 0.3f, (i % 5) * 0.7f, (i % 3) * 1.1f, i * 0.05f))): _*)
    val got = Similarity.pqTopK(v, v.filter(col("vec_id") < 2), 4, 2, 1, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("nn_id"), r.getAs[Long]("approx_d_micro"))).toMap
    val data = (0L until 12L).map(i =>
      i -> Array(i * 0.3f, (i % 5) * 0.7f, (i % 3) * 1.1f, i * 0.05f)).toMap
    def subMicro(a: Array[Float], b: Array[Float], s: Int): Long = {
      val d = (s * 2 until s * 2 + 2).map { j =>
        val diff = a(j).toDouble - b(j).toDouble; diff * diff
      }.sum
      BigDecimal(d * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    for (q <- 0L until 2L) {
      val expect = (0L until 12L).filter(_ != q)
        .map(n => (subMicro(data(q), data(n), 0) + subMicro(data(q), data(n), 1), n))
        .sorted.take(3)
      for (((d, n), i) <- expect.zipWithIndex)
        assert(got((q, i + 1)) == ((n, d)), s"query $q rank ${i + 1}")
    }
  }

  test("pqRerankTopK with a full-corpus shortlist equals bruteForceTopK") {
    // shortlist = |corpus| - 1: every candidate survives the ADC cut, so
    // the exact re-rank must reproduce the brute-force ranking bit-for-bit
    val v = vecs((0L until 12L).map(i =>
      (i, Seq(i * 0.3f + 0.1f, (i % 5) * 0.7f, (i % 3) * 1.1f, i * 0.05f))): _*)
    val q = v.filter(col("vec_id") < 2)
    val got = Similarity.pqRerankTopK(v, q, 4, 2, 1, 11, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("nn_id"), r.getAs[Double]("cosine"))).toMap
    val want = Similarity.bruteForceTopK(v, q, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("nn_id"), r.getAs[Double]("cosine"))).toMap
    assert(got == want)
  }

  test("mmrTopK prefers a diverse pick over a redundant higher-relevance one") {
    // query (1,1); candidates 1 and 2 are identical, 3 mirrors them across
    // the query axis. All three tie on relevance (pick lowest id first);
    // at lambda=50 the mirror's diversity then beats the exact duplicate.
    val v = vecs((0L, Seq(1f, 1f)), (1L, Seq(1f, 0.9f)),
      (2L, Seq(1f, 0.9f)), (3L, Seq(0.9f, 1f)))
    val r = Similarity.mmrTopK(v, v.filter(col("vec_id") === 0), 3, 50)
      .orderBy("sel_round").collect()
    assert(r.map(_.getAs[Long]("sel_id")).toSeq == Seq(1L, 3L, 2L))
    // round 1 score is raw relevance; the duplicate's final score is
    // rel/2 - 1/2 (max-sim to an identical selected vector is 1)
    assert(r(0).getAs[Double]("score") > 0.99)
    assert(r(2).getAs[Double]("score") < 0)
  }

  test("lshCosinePairs: scaled twin collides in every band; verify filters the rest") {
    val base = Seq(0.5f, -1f, 2f, 0.25f, 1f, -0.5f, 0.75f, -2f)
    val near = base.map(_ * 1.01f) // same projection signs -> same signature
    val far = Seq(2f, 1f, -0.5f, 1f, -1f, 2f, -0.75f, 0.5f)
    val r = Similarity.lshCosinePairs(
      vecs((1L, base), (2L, near), (3L, far)), 0.95, 8, 8, 4).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 2L)
    assert(r(0).getDouble(2) > 0.99)
  }

  test("cosineDupPairs finds near-identical vectors") {
    val r = Similarity.cosineDupPairs(vecs(
      (0L, Seq(1f, 1f, 0f)), (1L, Seq(0.99f, 1.01f, 0f)), (2L, Seq(0f, 0f, 1f))), 0.95).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("id1") == 0L && r(0).getAs[Long]("id2") == 1L)
  }

  test("cosineDupPairsExact triangular grid covers every pair exactly once") {
    import graft.functions.VectorFunctions._
    graft.expr.VecExpressions.register(spark)
    // reference: plain cross join (the shape the grid replaces)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val v = e.select(col("vec_id").as("id"), col("embedding").as("v"),
      normNative(col("embedding")).as("nrm"))
    val ref = v.as("a").crossJoin(v.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(cosineWithNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")), 6).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Similarity.cosineDupPairsExact(e, 0.4, blocks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == got.toSet.size, "duplicate pairs from grid overlap")
    assert(got.toSet == ref, s"grid missed or invented pairs")
  }

  test("ivfTopK: probed search returns neighbors from nearest cells") {
    // centroids at ids 0 and 100 (centroidEvery=100 → 0,100)
    val v = vecs(
      (0L, Seq(1f, 0f)), (1L, Seq(0.95f, 0.05f)), (2L, Seq(0.9f, 0.1f)),
      (100L, Seq(0f, 1f)), (101L, Seq(0.05f, 0.95f)))
    val r = Similarity.ivfTopK(v, v.filter(col("vec_id") === 1), 2, 1, 100)
      .orderBy("rank").collect()
    // query 1 probes cell of centroid 0 only → neighbors 0 and 2
    assert(r.map(_.getAs[Long]("nn_id")).toSeq == Seq(0L, 2L))
  }

  test("trainCentroids: Lloyd's recovers planted cluster structure") {
    // two tight clusters; k=2 must put one centroid in each
    val v = vecs(
      (0L, Seq(1f, 0f)), (1L, Seq(0.98f, 0.02f)), (2L, Seq(1.02f, -0.02f)),
      (10L, Seq(0f, 1f)), (11L, Seq(0.02f, 0.98f)), (12L, Seq(-0.02f, 1.02f)))
    val cents = Similarity.trainCentroids(v, 2, iters = 5)
      .orderBy("cent_id").collect()
      .map(_.getSeq[Float](1))
    assert(cents.length == 2)
    // one centroid near (1,0), the other near (0,1)
    assert(cents.exists(c => math.abs(c(0) - 1.0) < 0.05 && math.abs(c(1)) < 0.05))
    assert(cents.exists(c => math.abs(c(0)) < 0.05 && math.abs(c(1) - 1.0) < 0.05))
  }

  test("trainCentroids is deterministic across runs") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def run() = Similarity.trainCentroids(e, 8, iters = 3)
      .orderBy("cent_id").collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    val (a, b) = (run(), run())
    assert(a.toSeq == b.toSeq, "two identical trainings diverged")
  }

  test("ivfTopKWith trained centroids: recall vs brute force") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val cents = Similarity.trainCentroids(e, 8, iters = 3)
    val exact = Similarity.bruteForceTopK(e, q, 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val ivf = Similarity.ivfTopKWith(e, q, 3, 2, cents)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nn_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"trained-IVF recall@3 (nprobe=2/8 cells): $recall%.2f")
    assert(recall >= 0.5, f"recall $recall%.2f below floor")
  }

  test("randomProject approximately preserves norms (JL property)") {
    // E[||Pv||^2] = ||v||^2 with relative std ~ sqrt(2/outDim); at
    // outDim=32 every ratio should land well inside [0.3, 3] and the mean
    // near 1 — distance-preservation is WHY the sketch is usable for ANN
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val p = Similarity.randomProject(e, "vec_id", "embedding", 64, 32)
    val projNorm = (0 until 32).map(j => col(s"p$j") * col(s"p$j")).reduce(_ + _)
    val origNorm = aggregate(col("embedding").cast("array<double>"),
      lit(0d), (acc, x) => acc + x * x)
    val ratios = e.select(col("vec_id"), origNorm.as("n0"))
      .join(p.select(col("vec_id"), projNorm.as("n1")), "vec_id")
      .filter(col("n0") > 0)
      .select((col("n1") / col("n0")).as("r"))
      .collect().map(_.getDouble(0))
    assert(ratios.forall(r => r > 0.3 && r < 3.0),
      s"JL distortion out of range: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.25, s"mean norm ratio drifted: $mean")
  }

  test("randomProject is deterministic and seed-free across sessions/partitionings") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def run(parts: Int) =
      Similarity.randomProject(e.repartition(parts), "vec_id", "embedding", 64, 8)
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(run(2) == run(11))
  }

  test("ivfTopKWith trained centroids plans like gated sim2 (no oracle needed)") {
    // The trained path is spec-gated (Lloyd's is not replicable in DuckDB
    // SQL at reasonable cost); this locks that it produces the SAME
    // physical shape as the oracle-gated id-derived path: the keep=1
    // corpus assignment collapses map-side (partial_min) and nothing
    // degenerates into a nested-loop pairing. Centroids are precomputed
    // (collect+recreate) so the training job's own plan doesn't obscure
    // the search plan under audit.
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = Similarity.trainCentroids(e, 8, iters = 1)
    val trained = cents.collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    import spark.implicits._
    val centsDf = spark.createDataset(trained.toSeq).toDF("cent_id", "cent_vec")
      .withColumn("cent_vec", col("cent_vec").cast("array<float>"))
    val q = e.filter(col("vec_id") < 10)
    val plan = Similarity.ivfTopKWith(e, q, 3, 2, centsDf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"trained-IVF corpus assignment lost the partial-aggregable argmin:\n$plan")
    // centroid scoring is a BROADCAST nested-loop against the k-row
    // centroid table — bounded and intended; what must never appear is a
    // non-broadcast cartesian pairing
    assert(!plan.contains("CartesianProduct"),
      s"non-broadcast cartesian pairing in trained-IVF plan:\n$plan")
  }

  test("kCenterGreedy: seed is min id, each round picks the farthest " +
      "point, selected set is disjoint, distances non-increasing-ish " +
      "on a line") {
    import spark.implicits._
    // points on a line: 0, 1, 2, ..., 9 (1-D embeddings)
    val df = (0L to 9L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    val sel = Similarity.kCenterGreedy(df, 4).orderBy("round").collect()
    assert(sel.map(_.getLong(1)).toSeq == Seq(0L, 9L, 4L, 2L))
    // round 2: farthest from 0 is 9 at distance 9; round 3: the point
    // minimizing-max coverage is 4 (min-dist 4 to {0,9}); round 4: 2
    assert(sel(1).getDouble(2) == 9.0 && sel(2).getDouble(2) == 4.0 &&
      sel(3).getDouble(2) == 2.0)
    assert(sel.map(_.getLong(1)).distinct.length == 4)
  }

  test("kCenterGreedy incremental dmin: bit-identical to the " +
      "re-score-all-centers formulation at k=8") {
    import spark.implicits._
    val vecs = (0L to 39L).map(i =>
      (i, Array(((i * 37) % 11).toFloat, ((i * 13) % 7).toFloat,
        ((i * 5) % 3).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(df, 8).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // local reference: the O(k²·n) form — every candidate re-scored
    // against ALL selected centers each round (what the op used to do);
    // same per-pair micro-rounding and max-(dmin, -id) tie-break
    def round6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dist(a: Array[Float], b: Array[Float]): Double =
      round6(math.sqrt(a.zip(b).map { case (x, y) =>
        val dd = x.toDouble - y.toDouble; dd * dd }.sum))
    val byId = vecs.toMap
    var ref = Vector((1L, 0L, 0.0))
    for (r <- 2 to 8) {
      val ids = ref.map(_._2).toSet
      val best = vecs.filterNot(v => ids(v._1)).map { case (id, v) =>
        (id, ref.map(s => dist(v, byId(s._2))).min)
      }.maxBy { case (id, d) => (d, -id) }
      ref :+= ((r.toLong, best._1, best._2))
    }
    assert(got == ref)
  }

  test("kCenterGreedy guards: loud on empty corpus and on k exceeding " +
      "the corpus size") {
    import spark.implicits._
    val df = (0L to 2L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      Similarity.kCenterGreedy(df.filter(col("vec_id") < 0L), 2))
    assert(e1.getMessage.contains("empty corpus"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.kCenterGreedy(df, 5))
    assert(e2.getMessage.contains("exceeds the corpus size"))
  }
}

class GroupCentroidsSpec extends SparkSpec {
  test("groupCentroids: partition-order-independent, tracks the naive mean") {
    import spark.implicits._
    val rows = (1L to 90L).map(i =>
      ((i % 3).toString, Array((i % 7).toFloat / 7f, -(i % 5).toFloat / 5f)))
    val a = Similarity.groupCentroids(rows.toDF("g", "v").repartition(2), "g", "v").collect()
    val b = Similarity.groupCentroids(rows.toDF("g", "v").repartition(17), "g", "v").collect()
    // fixed-point sums are order-free: bit-identical under any partitioning
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    val naive = rows.groupBy(_._1).map { case (g, vs) =>
      (g, 1L) -> vs.map(_._2(0).toDouble).sum / vs.size }
    a.filter(_.getLong(1) == 1L).foreach { r =>
      val want = naive((r.getString(0), 1L))
      assert(math.abs(r.getDouble(3) - want) < 2e-6, s"${r.getString(0)}: ${r.getDouble(3)} vs $want")
    }
  }
}

class MultimodalSpec extends SparkSpec {
  test("routeModality: magic bytes classify PNG/WAV, junk quarantines as unknown") {
    import spark.implicits._
    val d = Seq((2L, ""), (4L, "")).toDF("doc_id", "text")
    val png = Multimodal.withGeneratedPng(d)
    val wav = Multimodal.withGeneratedWav(d.select((col("doc_id") + 1).as("doc_id")))
    val junk = Seq((99L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)))
      .toDF("doc_id", "media")
    val out = Multimodal.routeModality(png.unionByName(wav).unionByName(junk))
      .select("doc_id", "modality").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "image", 4L -> "image",
      3L -> "audio", 5L -> "audio", 99L -> "unknown"), out.toString)
    // a TRUNCATED png prefix (magic intact) still routes as image —
    // the router admits, the decoder's NULL-on-corrupt contract proves
    val broken = Seq((7L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47,
      0x0D, 0x0A, 0x1A, 0x0A, 0x00))).toDF("doc_id", "media")
    val r = Multimodal.routeModality(broken).head.getString(2)
    assert(r == "image")
    val decoded = Multimodal.dhashImage(broken).head
    assert(decoded.isNullAt(1), "corrupt-but-routed row must decode to NULL")
  }

  test("pngHeaderStats: IHDR dims match the real decoder; non-PNG rows NULL") {
    import spark.implicits._
    val d = Seq((2L, ""), (11L, ""), (40L, "")).toDF("doc_id", "text")
    val png = Multimodal.withGeneratedPng(d)
    val got = Multimodal.pngHeaderStats(png).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // header parse must equal the REAL ImageIO decode, not just the
    // generation arithmetic
    val dec = Multimodal.decodeImage(png).select("doc_id", "width", "height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getInt(2).toLong))).toMap
    assert(got == dec, s"header $got vs decoder $dec")
    val junk = Seq((99L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
      11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24)))
      .toDF("doc_id", "media")
    val j = Multimodal.pngHeaderStats(junk).head
    assert(j.isNullAt(1) && j.isNullAt(2) && j.getLong(3) == 24L)
    // decode-free: the projection stays codegen, no UDF, no ImageIO
    val plan = Multimodal.pngHeaderStats(png).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("mapPartitions"), plan)
  }

  test("routeModality stays codegen-compiled (no UDF)") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2))).toDF("doc_id", "media")
    val plan = Multimodal.routeModality(df).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("decodeStub: deterministic dims + checksum via mapPartitions") {
    import spark.implicits._
    val df = Seq((7L, "abc")).toDF("doc_id", "text")
    val r = Multimodal.decodeStub(Multimodal.withMedia(df)).collect().head
    assert(r.getAs[Int]("n_bytes") == 3)
    assert(r.getAs[Int]("width") == 16 + 'a'.toInt % 16)
    assert(r.getAs[Int]("height") == 16 + 'b'.toInt % 16)
    assert(r.getAs[String]("checksum") == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("decodeImage: real PNG dimensions via ImageIO; junk bytes degrade to (-1,-1)") {
    import spark.implicits._
    // fixture: a real 13x7 PNG encoded in-memory
    val img = new java.awt.image.BufferedImage(13, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 2, 0xff8800)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "media")
    val rows = Multimodal.decodeImage(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Int]("width") == 13 && rows(1L).getAs[Int]("height") == 7)
    assert(rows(1L).getAs[Int]("n_bytes") == png.length)
    assert(rows(2L).getAs[Int]("width") == -1 && rows(2L).getAs[Int]("height") == -1)
  }

  test("resizeImage: real resample round-trips through the codec, corrupt channel intact") {
    import spark.implicits._
    // 4x2 source with known pixels; resize to 2x1 → nearest-neighbor picks
    // src(0,0) and src(2,0) per the (x*sw)/w mapping
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, x + 10 * y)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val df = Seq((1L, baos.toByteArray), (2L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media")
    val rows = Multimodal.resizeImage(df, 2, 1).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("pix_sum") == 0L + 2L) // src(0,0)=0 + src(2,0)=2
    // the emitted payload is a real PNG that decodes back to the target dims
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rows(1L).getAs[Array[Byte]]("media")))
    assert(back.getWidth == 2 && back.getHeight == 1)
    assert((back.getRGB(1, 0) & 0xffffff) == 2)
    assert(rows(2L).getAs[Int]("width") == -1 && rows(2L).isNullAt(3))
  }

  test("resizeStub bounds the payload to the target budget") {
    import spark.implicits._
    val df = Seq((1L, "x" * 1000), (2L, "y")).toDF("doc_id", "text")
    val r = Multimodal.resizeStub(Multimodal.withMedia(df), 8, 8)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Array[Byte]]("media").length == 64) // truncated to w*h
    assert(r(1).getAs[Array[Byte]]("media").length == 1)  // short payload kept
    assert(r.forall(_.getAs[Int]("width") == 8))
  }

  test("frameSampleStub: every Nth fixed-size frame becomes a row") {
    import spark.implicits._
    // 1000 bytes → frames of 256: idx 0..3 (last=232 bytes); every 2nd → 0,2
    val df = Seq((5L, "z" * 1000)).toDF("doc_id", "text")
    val r = Multimodal.frameSampleStub(Multimodal.withMedia(df), 256, 2)
      .orderBy("frame_idx").collect()
    assert(r.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(r.map(_.getAs[Int]("frame_bytes")).toSeq == Seq(256, 256))
    // empty payload → no frames, not a crash
    assert(Multimodal.frameSampleStub(
      Multimodal.withMedia(Seq((6L, "")).toDF("doc_id", "text"))).count() == 0)
  }

  test("withGeneratedGif round-trips exactly through the real frame sampler") {
    import spark.implicits._
    // id 7: w=6+2=8, h=6+1=7, nf=2+3=5 frames; everyN=1 keeps all
    val r = Multimodal.frameSampleImage(
        Multimodal.withGeneratedGif(Seq((7L, "x")).toDF("doc_id", "text")), 1)
      .orderBy("frame_idx").collect()
    assert(r.length == 5)
    assert(r.forall(x => x.getAs[Int]("width") == 8 && x.getAs[Int]("height") == 7))
    // exact palette arithmetic: no quantization, no gamma
    def expected(f: Int): Long =
      (for (y <- 0 until 7; x <- 0 until 8)
        yield ((7L + 31 * x + 131 * y + 997 * f) % 256) * 65793L).sum
    for (row <- r)
      assert(row.getAs[Long]("pix_sum") == expected(row.getAs[Int]("frame_idx")))
    // non-media bytes land in the corrupt channel, not a task failure
    val bad = Multimodal.frameSampleImage(
      Multimodal.withMedia(Seq((1L, "not a gif")).toDF("doc_id", "text")), 2).collect()
    assert(bad.length == 1 && bad.head.getAs[Int]("frame_idx") == -1)
  }

  test("withGeneratedWav round-trips exactly through the real audio decoder") {
    import spark.implicits._
    // id 3: 403 samples, sample i = (3 + 7i) % 256
    val r = Multimodal.decodeAudio(
        Multimodal.withGeneratedWav(Seq((3L, "x")).toDF("doc_id", "text")))
      .collect().head
    assert(r.getAs[Int]("sample_rate") == 8000)
    assert(r.getAs[Long]("n_samples") == 403L)
    assert(r.getAs[Long]("amp_sum") ==
      (0 until 403).map(i => (3L + 7 * i) % 256).sum)
    // non-audio bytes land in the corrupt channel, not a task failure
    val bad = Multimodal.decodeAudio(
      Multimodal.withMedia(Seq((1L, "not audio at all")).toDF("doc_id", "text"))).collect()
    assert(bad.length == 1 && bad.head.getAs[Int]("sample_rate") == -1)
  }

  test("embedStub output feeds the ANN operators end-to-end") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "alpha"), (3L, "totally different")).toDF("doc_id", "text")
    val emb = Multimodal.embedStub(Multimodal.withMedia(docs), dim = 8)
      .withColumnRenamed("doc_id", "vec_id")
    // identical payloads → identical embeddings → cosine 1 top hit
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1), 1)
      .collect().head
    assert(top.getAs[Long]("nn_id") == 2L)
    assert(top.getAs[Double]("cosine") == 1.0)
  }

  test("embedText: unit norm, token-order invariance, sign/bucket math") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"), // same bag
      (3L, "alpha alpha alpha"), (4L, "")).toDF("doc_id", "text")
    val r = Similarity.embedText(docs, dim = 8)
      .collect().map(x => x.getLong(0) -> x.getSeq[Float](1)).toMap
    // bag-of-tokens: order must not matter
    assert(r(1L) == r(2L))
    // L2 norm 1 for non-empty docs (float tolerance), zero vector for empty
    def nrm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(nrm(r(1L)) - 1.0) < 1e-6)
    assert(r(4L).forall(_ == 0f) && r(4L).length == 8)
    // a single repeated token concentrates all mass in one bucket
    assert(r(3L).count(x => math.abs(x) == 1f) == 1)
    assert(r(3L).count(_ == 0f) == 7)
    // bucket/sign replay for "alpha": md5 first 8 hex mod 8, 9th hex parity
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val b = (java.lang.Long.parseLong(h.substring(0, 8), 16) % 8).toInt
    val s = if (java.lang.Long.parseLong(h.substring(8, 9), 16) % 2 == 0) 1f else -1f
    assert(r(3L)(b) == s)
  }

  test("embedText feeds ANN: identical texts are exact neighbors") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "unrelated totally other words")).toDF("doc_id", "text")
    val emb = Similarity.embedText(docs, dim = 16).withColumnRenamed("doc_id", "vec_id")
    val top = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 1), 1)
      .collect().head
    assert(top.getAs[Long]("nn_id") == 2L)
    assert(top.getAs[Double]("cosine") == 1.0)
  }
}
