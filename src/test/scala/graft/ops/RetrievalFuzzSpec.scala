package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fuzz the round-10 operators against independent Scala references
  * (same discipline as PropertyFuzzSpec / SkillMatcherFuzzProps): BM25's
  * micro-unit arithmetic, the Gopher cascade, and the Hilbert state
  * machine each re-derived naively and compared over generated inputs —
  * one DataFrame batch per property, seeded.
  */
class RetrievalFuzzSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(911L + i)))
      .collect { case Some(v) => v }
      .take(n).toSeq

  private val word: Gen[String] =
    Gen.oneOf("spark", "join", "scan", "agg", "the", "a", "flux", "merge",
      "row", "shuffle", "filter", "broadcast", "sort", "window")

  private val doc: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  /** Naive BM25: tokenize, df/tf/dl by hand, EXACT same double expression
    * order as ops.Retrieval, micro-rounded per term then summed as longs.
    */
  private def refBm25(docs: Seq[(Long, String)], queryTerms: Seq[(Long, String)])
      : Map[(Long, Long), Long] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size.toLong
    val dlSum = toks.values.map(_.size.toLong).sum
    val avgdl = dlSum.toDouble / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val out = scala.collection.mutable.Map[(Long, Long), Long]()
    for ((qid, term) <- queryTerms.distinct; (docId, dts) <- toks) {
      val tf = dts.count(_ == term).toLong
      if (tf > 0) {
        val dfi = df(term)
        val idf = math.log(1.0 + (n - dfi + 0.5) / (dfi + 0.5))
        val tfn = tf * (Retrieval.K1 + 1.0) /
          (tf + Retrieval.K1 * ((1.0 - Retrieval.B) + Retrieval.B * dts.size / avgdl))
        val c = BigDecimal(idf * tfn * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        out((qid, docId)) = out.getOrElse((qid, docId), 0L) + c
      }
    }
    out.toMap
  }

  test("bm25Scores == naive reference over generated corpora (fuzzed)") {
    import spark.implicits._
    val corpora = samples(Gen.choose(3, 9).flatMap(k =>
      Gen.listOfN(k, doc)), 12)
    for ((docsList, ci) <- corpora.zipWithIndex) {
      val docs = docsList.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val qts = samples(word, 4).distinct.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }
      val got = Retrieval.bm25Scores(docs.toDF("doc_id", "text"), "text", "doc_id",
          qts.toDF("query_id", "term"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = refBm25(docs, qts)
      assert(got == want, s"corpus #$ci: engine=$got ref=$want docs=$docs qts=$qts")
    }
  }

  /** Naive Gopher cascade mirror. */
  private def refGopher(text: String): (Long, String) = {
    val ts = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val n = ts.size.toLong
    val sumLen = ts.map(_.length.toLong).sum
    val nStop = ts.count(graft.functions.TextFunctions.Stopwords.contains).toLong
    val topCnt = if (ts.isEmpty) 0L else ts.groupBy(identity).values.map(_.size).max.toLong
    val v =
      if (n < 3) "too_short"
      else if (n > 10) "too_long"
      else if (10 * sumLen < 30 * n) "words_too_short"
      else if (10 * sumLen > 100 * n) "words_too_long"
      else if (nStop < 1) "low_stopword"
      else if (1000 * topCnt > 400 * n) "repetitive"
      else "kept"
    (n, v)
  }

  test("gopherFilter == naive cascade over generated docs (fuzzed)") {
    import spark.implicits._
    val docs = samples(doc, 250).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = Curation.gopherFilter(docs.toDF("doc_id", "text"), "text", "doc_id",
        3, 10, 30, 100, 1, 400)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(5)))).toMap
    docs.foreach { case (id, t) =>
      assert(got(id) == refGopher(t), s"doc $id '$t': engine=${got(id)} ref=${refGopher(t)}")
    }
  }

  test("unigramViterbiSegment: cost-optimal vs full enumeration; tie-break vs naive DP") {
    import spark.implicits._
    val docs = samples(doc, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = Tokenize.unigramViterbiSegment(docs.toDF("doc_id", "text"), "text", 4, 12)
      .collect().map(r => r.getString(0) -> ((r.getString(2), r.getLong(4)))).toMap
    // independent piece-cost table
    val words = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val cnt = scala.collection.mutable.Map[String, Long]()
    for ((w, wc) <- words; j <- 0 until w.length;
         l <- 1 to math.min(4, w.length - j))
      cnt(w.substring(j, j + l)) = cnt.getOrElse(w.substring(j, j + l), 0L) + wc
    val totv = cnt.values.sum + cnt.size
    def pc(p: String): Long = BigDecimal(-math.log((cnt(p) + 1).toDouble / totv) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // (1) enumeration: engine cost must be the true minimum
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap(l =>
        allSegs(w.substring(l)).map(w.substring(0, l) +: _))
    // (2) naive DP with the engine's (cost, longer-last-piece, path) tie-break
    def dpSeg(w: String): (String, Long) = {
      val best = new Array[(Long, Long, String)](w.length + 1) // (cost, -lastLen, path)
      best(0) = (0L, 0L, "")
      for (i <- 1 to w.length) {
        val cands = for (l <- 1 to math.min(4, i)) yield {
          val p = w.substring(i - l, i)
          val (c0, _, s0) = best(i - l)
          (c0 + pc(p), -l.toLong, if (s0.isEmpty) p else s0 + "|" + p)
        }
        best(i) = cands.min
      }
      (best(w.length)._3, best(w.length)._1)
    }
    for (w <- words.keys) {
      val (seg, cost) = got(w)
      val minCost = allSegs(w).map(_.map(pc).sum).min
      assert(cost == minCost, s"'$w': engine cost $cost != enumerated min $minCost")
      assert((seg, cost) == dpSeg(w), s"'$w': engine $seg vs naive DP ${dpSeg(w)}")
    }
  }

  /** Naive Hilbert xy→d (classic iterative form). */
  private def refHilbert(x0: Long, y0: Long, bits: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("withHilbertIndex == naive state machine over random 16-bit points (fuzzed)") {
    import spark.implicits._
    val pts = samples(for {
      x <- Gen.choose(0L, 65535L); y <- Gen.choose(0L, 65535L)
    } yield (x, y), 500).distinct
    val got = Layout.withHilbertIndex(pts.toDF("x", "y"), "x", "y", 16, "h")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refHilbert(x, y, 16),
        s"($x,$y): engine=${got((x, y))} ref=${refHilbert(x, y, 16)}")
    }
  }
}
