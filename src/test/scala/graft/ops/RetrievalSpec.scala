package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Retrieval]] — BM25, posting lists, RRF fusion. The BM25 case is
  * checked against a hand-computed score on a 4-doc corpus (exact
  * micro-unit arithmetic), so the spec fails if anyone re-associates the
  * double expression the DuckDB oracle mirrors.
  */
class RetrievalSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "spark shuffle join"),
      (1L, "spark filter scan scan"),
      (2L, "join join shuffle broadcast"),
      (3L, "window agg")).toDF("doc_id", "text")
  }

  private def queryTerms(ts: (Long, String)*) = {
    import spark.implicits._
    ts.toDF("query_id", "term")
  }

  test("bm25: hand-computed score, rank order, micro-unit determinism") {
    // Corpus stats: n=4, dl = 3,4,4,2 → dl_sum=13, avgdl=3.25.
    // Query {join}: df(join)=2, idf = ln(1 + 2.5/2.5) = ln 2.
    // doc0: tf=1, tfn = 2.2/(1 + 1.2*(0.25 + 0.75*3/3.25))
    // doc2: tf=2, tfn = 4.4/(2 + 1.2*(0.25 + 0.75*4/3.25))
    def contrib(tf: Double, dl: Double): Long = {
      val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
      val tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (13.0 / 4)))
      math.round(idf * tfn * 1e6)
    }
    val got = Retrieval.bm25TopK(corpus, "text", "doc_id",
        queryTerms(7L -> "join"), 5)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(2L, 0L)) // tf=2 doc outranks tf=1
    assert(got.map(t => (t._1, t._3)).toMap ==
      Map(2L -> contrib(2, 4) / 1e6, 0L -> contrib(1, 3) / 1e6))
  }

  test("bm25: multi-term queries sum per-term micro contributions") {
    val one = Retrieval.bm25Scores(corpus, "text", "doc_id",
      queryTerms(1L -> "spark")).withColumnRenamed("score_micro", "a")
    val two = Retrieval.bm25Scores(corpus, "text", "doc_id",
      queryTerms(1L -> "spark", 1L -> "shuffle"))
    val both = two.join(
      Retrieval.bm25Scores(corpus, "text", "doc_id", queryTerms(1L -> "shuffle"))
        .withColumnRenamed("score_micro", "b"), Seq("query_id", "doc_id"), "left")
      .join(one, Seq("query_id", "doc_id"), "left")
    assert(both.filter(col("score_micro") =!=
      coalesce(col("a"), lit(0L)) + coalesce(col("b"), lit(0L))).isEmpty)
  }

  test("bm25: df-pruning drops high-df terms exactly") {
    // 'spark' df=2/4 = 500 permille: kept at 500, dropped at 499.
    val kept = Retrieval.bm25Scores(corpus, "text", "doc_id",
      queryTerms(1L -> "spark"), maxDfPermille = Some(500L))
    val dropped = Retrieval.bm25Scores(corpus, "text", "doc_id",
      queryTerms(1L -> "spark"), maxDfPermille = Some(499L))
    assert(kept.count() == 2 && dropped.count() == 0)
  }

  test("postingLists: sorted postings, df/tf_sum, max delta-gap") {
    val pl = Retrieval.postingLists(corpus, "text", "doc_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[Long](3), r.getLong(4))).toMap
    assert(pl("join") == ((2L, 3L, Seq(0L, 2L), 2L)))
    assert(pl("scan") == ((1L, 2L, Seq(1L), 0L))) // single posting → gap 0
    assert(pl("spark") == ((2L, 2L, Seq(0L, 1L), 1L)))
  }

  test("rrfFuse: item on both lists beats single-list items; exact micro sums") {
    import spark.implicits._
    val dense = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "item_id", "rank")
    val sparse = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "item_id", "rank")
    val got = Retrieval.rrfFuse(Seq(dense, sparse), 10)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(3), r.getLong(4)))
    val r1 = math.round(1e6 / 61) // rank 1
    val r2 = math.round(1e6 / 62) // rank 2
    assert(got.toSeq == Seq(
      (11L, 1L, r1 + r2, 2L), // both lists
      (10L, 2L, r1, 1L), // dense only, rank tie broken by item_id
      (12L, 3L, r2, 1L)))
  }

  test("ndcgAtK: hand-computed DCG/IDCG, MRR, and the no-relevant null case") {
    import spark.implicits._
    def tm(r: Long): Long = math.round(1e6 * math.log(2.0) / math.log(r + 1.0))
    val ranked = Seq(
      (1L, 100L, 1L), (1L, 101L, 2L), (1L, 102L, 3L), // q1: rel at ranks 1,3
      (2L, 100L, 1L), (2L, 101L, 2L)) // q2: nothing relevant
      .toDF("query_id", "item_id", "rank")
    val rel = Seq((1L, 100L), (1L, 102L), (1L, 103L)) // 103 exists but unranked
      .toDF("query_id", "item_id")
    val got = Retrieval.ndcgAtK(ranked, rel, 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = got(1L)
    assert(q1.getLong(1) == 3 && q1.getLong(2) == 1 && q1.getLong(3) == 1000000L)
    assert(q1.getLong(4) == tm(1) + tm(3)) // dcg: hits at ranks 1 and 3
    assert(q1.getLong(5) == tm(1) + tm(2) + tm(3)) // idcg: min(n_rel, k) = 3
    assert(q1.getDouble(6) ==
      math.rint(1e6 * (tm(1) + tm(3)).toDouble / (tm(1) + tm(2) + tm(3))) / 1e6)
    val q2 = got(2L)
    assert(q2.getLong(1) == 0 && q2.getLong(2) == 0 && q2.getLong(3) == 0)
    assert(q2.getLong(5) == 0 && q2.isNullAt(6)) // no relevant → ndcg null
  }

  test("bm25 probe plan: query terms and df frame broadcast, corpus side single-pass") {
    val plan = Retrieval.bm25Scores(corpus, "text", "doc_id",
      queryTerms(1L -> "spark")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("tfidfTopK: rare terms outrank common ones; k and tie order hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zebra common common common"),
      (2L, "common common apple apple"),
      (3L, "common banana")
    ).toDF("doc_id", "text")
    val got = Retrieval.tfidfTopK(docs, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // 'common' appears in all 3 docs -> ln(3/3)=0, never a top keyword
    // over any term unique to the doc
    assert(got((1L, 1L))._1 == "zebra")
    assert(got((2L, 1L))._1 == "apple")
    assert(got((3L, 1L))._1 == "banana")
    // df=3 term scores exactly 0 micro
    assert(got((1L, 2L)) == (("common", 0L)))
    // apple: tf=2, df=1 -> 2*ln(3)*1e6 rounded
    val want = math.round(2 * math.log(3.0) * 1e6)
    assert(got((2L, 1L))._2 == want)
    // k=2 respected
    assert(!got.contains((1L, 3L)))
  }
}
