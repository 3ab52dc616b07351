package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style fuzzing of the Spark column rules against independent
  * Scala reference implementations (SURVEY §5). ScalaCheck generators
  * drive the inputs; evaluation runs as ONE DataFrame batch per property
  * (per-sample Spark jobs would be prohibitive), seeded for determinism.
  */
class PropertyFuzzSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(v) => v }
      .take(n).toSeq

  // --- E1 pay extraction -------------------------------------------------

  /** Independent reference of the E1 rule (reference main.py:142-149):
    * last regex match, then £/GBP strip, K→000 BEFORE comma/space removal.
    */
  private def refPay(desc: String): Option[Double] = {
    val m = EtlFunctions.PayRegex.r.findAllIn(desc).toSeq
    m.lastOption.map { raw =>
      raw.replace("£", "").replace("GBP", "").replace("K", "000")
        .replace(",", "").replace(" ", "").toDouble
    }
  }

  private val amount: Gen[String] = Gen.oneOf(
    for (n <- Gen.choose(10, 200)) yield s"£${n}K",
    for (n <- Gen.choose(1, 9); d <- Gen.choose(0, 9)) yield s"£$n,${d}K",
    for (n <- Gen.choose(10000, 99000)) yield s"$n GBP",
    for (n <- Gen.choose(10, 99)) yield s"$n,000GBP")

  private val payText: Gen[String] = for {
    words <- Gen.listOfN(4, Gen.oneOf("salary", "role", "offers", "package", "benefits"))
    amounts <- Gen.listOf(amount).map(_.take(3))
    mixed <- Gen.const((words ++ amounts).mkString(" "))
  } yield mixed

  test("E1 pay extraction == reference semantics over generated salary text") {
    import spark.implicits._
    val rows = samples(payText, 300)
    val got = rows.toDF("description")
      .select(EtlFunctions.extractPay(col("description")))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    rows.zip(got).foreach { case (in, out) =>
      assert(out == refPay(in), s"input '$in': engine=$out ref=${refPay(in)}")
    }
  }

  // --- P3 negated-contains 3VL ------------------------------------------

  test("P3 filter drops null titles AND Software titles (3VL) on generated rows") {
    import spark.implicits._
    val title: Gen[Option[String]] = Gen.frequency(
      2 -> Gen.const(None),
      3 -> Gen.oneOf("Software Engineer", "Senior Software Dev").map(Some(_)),
      5 -> Gen.oneOf("Data Engineer", "Analyst", "Platform Lead").map(Some(_)))
    val rows = samples(title, 200)
    val kept = rows.toDF("title")
      .filter(!col("title").contains("Software"))
      .as[String].collect().toSeq
    val expected = rows.collect { case Some(t) if !t.contains("Software") => t }
    assert(kept.sorted == expected.sorted)
  }

  // --- split/sampling hash ----------------------------------------------

  test("hashBucket stays in [0,100) and withSplit labels match thresholds") {
    import spark.implicits._
    val ids = samples(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2), 500)
    val df = ids.toDF("id")
    val buckets = df.select(graft.ops.Sampling.hashBucket(col("id"), 100)).as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 100))
    val labeled = graft.ops.Sampling
      .withSplit(df, "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("id"), graft.ops.Sampling.hashBucket(col("id"), 100).as("b"), col("split"))
      .collect()
    labeled.foreach { r =>
      val (b, s) = (r.getLong(1), r.getString(2))
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == want, s"id=${r.getLong(0)} bucket=$b split=$s")
    }
  }

  // --- connected components ----------------------------------------------

  /** Independent reference: classic path-compressed union-find, nothing
    * shared with either distributed formulation.
    */
  private def refComponents(n: Int, edges: Seq[(Int, Int)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root = component min because unions always parent the larger root
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("CMS never underestimates and is exact for below-width vocabularies (fuzzed)") {
    import spark.implicits._
    val corpusGen = Gen.listOfN(300,
      Gen.oneOf((0 until 40).map(i => s"tok$i")))
    val rounds = samples(corpusGen, 3)
    for (round <- 0 until 3) {
      val toks = rounds(round)
      val df = toks.toDF("t")
      val truth = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val est = graft.ops.Sketch.cmsEstimate(
          graft.ops.Sketch.cmsBuild(df, "t", 4, 256), df.distinct(), "t", 4, 256)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (t, n) =>
        assert(est(t) >= n, s"round $round: CMS underestimated $t")
      }
      // 40 tokens in 4x256 buckets: a 4-way simultaneous collision is
      // practically impossible — estimates should be exact
      assert(truth.forall { case (t, n) => est(t) == n }, s"round $round")
    }
  }

  test("pqCodes == brute-force per-subspace argmin on random vectors (fuzzed)") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.choose(-100, 100))
    val vecs = samples(vecGen, 30).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat / 7f).toArray) }
    val df = vecs.toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.pqCodes(df, 8, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val codebook = vecs.filter(_._1 % 10 == 0)
    for ((id, v) <- vecs; s <- 0 to 1) {
      val slice = v.slice(s * 4, s * 4 + 4)
      val best = codebook.map { case (cid, cv) =>
        val cs = cv.slice(s * 4, s * 4 + 4)
        val d = math.sqrt(slice.zip(cs).map { case (a, b) =>
          val diff = a.toDouble - b; diff * diff }.sum)
        // mirror the op's 6-decimal rounding before the argmin
        (BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, cid)
      }.min
      assert(got((id, s.toLong)) == best._2, s"vec $id sub $s")
    }
  }

  test("prefixJaccardPairs == jaccardDupPairs on random corpora (lossless fuzz)") {
    import spark.implicits._
    // small vocab + short docs force heavy shingle sharing — the regime
    // where a broken prefix bound would actually drop true pairs
    val docGen = Gen.listOfN(12, Gen.oneOf((0 until 8).map(i => s"w$i")))
      .map(_.mkString(" "))
    for (round <- 0 until 3) {
      val texts = samples(docGen, 25)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def pairs(r: org.apache.spark.sql.DataFrame) = r.collect()
        .map(x => (x.getAs[Long]("id1"), x.getAs[Long]("id2"),
          x.getAs[Double]("jaccard"))).toSet
      for (t <- Seq(0.3, 0.6)) {
        val exact = pairs(graft.ops.Dedup.jaccardDupPairs(df, "text", "doc_id", 2, t))
        val pref = pairs(graft.ops.Dedup.prefixJaccardPairs(df, "text", "doc_id", 2, t))
        assert(pref == exact, s"round $round t=$t: prefix filter dropped/invented pairs")
      }
    }
  }

  test("dupClusters AND dupClustersStar match union-find on random graphs") {
    import spark.implicits._
    val n = 40
    val graphGen: Gen[Seq[(Int, Int)]] = for {
      m <- Gen.choose(0, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (a, b))
    } yield es
    for ((edges, i) <- samples(graphGen, 5).zipWithIndex) {
      val want = refComponents(n, edges)
      val nodes = (0L until n.toLong).toDF("id")
      val e = edges.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
      val prop = graft.ops.Dedup.dupClusters(nodes, e, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = graft.ops.Dedup.dupClustersStar(nodes, e, "id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(prop == want, s"graph $i: propagation != union-find")
      assert(star == want, s"graph $i: star != union-find")
    }
  }

  test("bpeMerges == naive in-memory BPE on generated corpora") {
    import spark.implicits._
    // naive reference: word-frequency map, pair counts, (count desc, pair
    // asc) argmax, symbol-level left-to-right non-overlapping merge
    def naiveBpe(words: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
      var wf: Map[Vector[String], Long] = words.groupBy(identity)
        .map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      for (_ <- 1 to rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, n) <- wf; i <- 0 until syms.size - 1)
          counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
        if (counts.nonEmpty) {
          val ((l, r), c) = counts.toSeq
            .sortBy { case ((a, b), n) => (-n, a + " " + b) }.head
          out += ((l, r, c))
          wf = wf.map { case (syms, n) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            for (s <- syms) {
              if (acc.nonEmpty && acc.last == l && s == r)
                acc(acc.size - 1) = l + r
              else acc += s
            }
            acc.toVector -> n
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        }
      }
      out.toSeq
    }
    val word: Gen[String] = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpus: Gen[Seq[String]] = Gen.listOfN(12, word)
    for ((words, i) <- samples(corpus, 6).zipWithIndex) {
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ops.Tokenize.bpeMerges(df, "text", 3).orderBy("round")
        .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got == naiveBpe(words, 3), s"corpus $i '$words': got $got")
    }
  }

  test("binaryAuc == naive pairwise win/tie counting on generated score sets") {
    import spark.implicits._
    def naiveAuc(rows: Seq[(Double, Int)]): Option[Double] = {
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val wins = (for (p <- pos; q <- neg)
          yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        Some(BigDecimal(wins / (pos.size.toDouble * neg.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val row: Gen[(Double, Int)] = for {
      s <- Gen.choose(0, 20).map(_ / 20.0) // coarse grid → many exact ties
      y <- Gen.oneOf(0, 1)
    } yield (s, y)
    for ((rows, i) <- samples(Gen.listOfN(40, row), 6).zipWithIndex) {
      val r = graft.ops.Curation.binaryAuc(rows.toDF("score", "label"),
        "score", "label").collect()(0)
      val got = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(got == naiveAuc(rows), s"set $i: got $got want ${naiveAuc(rows)}")
    }
  }

  test("keySkewProfile == naive Gini/top-share on generated key sets") {
    import spark.implicits._
    def naive(keys: Seq[String]): (Long, Long, Long, Double, Double) = {
      val counts = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val ranked = counts.toSeq.sortBy { case (k, c) => (c, k) }.map(_._2)
      val (nk, nr) = (ranked.size.toLong, ranked.sum)
      val rc = ranked.zipWithIndex.map { case (c, i) => (i + 1).toLong * c }.sum
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (nr, nk, ranked.max,
        r6(ranked.max.toDouble / nr),
        r6(2.0 * rc / (nk.toDouble * nr) - (nk + 1.0) / nk))
    }
    val keyGen: Gen[String] = Gen.frequency(
      5 -> Gen.const("hot"), 2 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.choose(0, 30).map("k" + _))
    for ((keys, i) <- samples(Gen.listOfN(80, keyGen), 6).zipWithIndex) {
      val r = graft.ops.Profile.keySkewProfile(keys.toDF("k"), "k").collect()(0)
      val want = naive(keys)
      assert((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
        == want, s"set $i: got $r want $want")
      assert(r.getLong(2) == 0L) // no nulls generated
    }
  }

  test("vocabGrowth == naive prefix-distinct counting on generated corpora") {
    import spark.implicits._
    def bucketOf(id: Long, buckets: Int): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md5.take(4).map("%02x".format(_)).mkString, 16) % buckets
    }
    val word: Gen[String] = Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta")
    val doc: Gen[String] = Gen.listOfN(5, word).map(_.mkString(" "))
    for ((texts, i) <- samples(Gen.listOfN(30, doc), 4).zipWithIndex) {
      val rows = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val got = graft.ops.Curation.vocabGrowth(df, "text", "doc_id", 4)
        .orderBy("bucket").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq
      // naive: tokens per bucket + distinct vocab of the bucket-prefix
      val byBucket = rows.map { case (id, t) => bucketOf(id, 4) -> t.split(" ").toSeq }
      val present = byBucket.map(_._1).distinct.sorted
      val want = present.map { b =>
        val toks = byBucket.filter(_._1 == b).map(_._2.size.toLong).sum
        val cum = byBucket.filter(_._1 <= b).map(_._2.size.toLong).sum
        val vocab = byBucket.filter(_._1 <= b).flatMap(_._2).distinct.size.toLong
        (b, toks, cum, vocab)
      }
      assert(got == want, s"corpus $i: got $got want $want")
    }
  }

  test("CC stray-endpoint contract: both impls drop them, both let them carry connectivity") {
    import spark.implicits._
    // nodes 0..4; edges reference strays 90/91: 0-90, 90-1 (stray BRIDGES
    // 0 and 1), 2-91 (dangling stray), 3-4 direct. Contract: no output
    // row for 90/91, but 0 and 1 land in one component THROUGH 90.
    val nodes = (0L to 4L).toDF("id")
    val e = Seq((0L, 90L), (90L, 1L), (2L, 91L), (3L, 4L)).toDF("src", "dst")
    val want = Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 3L)
    for ((name, res) <- Seq(
        "propagation" -> graft.ops.Dedup.dupClusters(nodes, e, "id"),
        "star" -> graft.ops.Dedup.dupClustersStar(nodes, e, "id"))) {
      val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"$name stray contract: $got")
    }
    // non-integral ids refuse loudly instead of null-corrupting
    val bad = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      graft.ops.Dedup.dupClusters(nodes, bad, "id")
    }
  }
}
