package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Funnel]], [[Similarity.pqCodes]], [[Dedup.canonicalPerCluster]]. */
class FunnelSpec extends SparkSpec {

  test("funnel: steps gate on the previous step's time; drop-offs keep NULLs") {
    import spark.implicits._
    // u1 completes in order; u2's purchase PRECEDES its click (not counted);
    // u3 views only; u4 never views (absent from output)
    val e = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 50L, "click"), (2L, 40L, "purchase"),
      (3L, 5L, "view"),
      (4L, 1L, "click"), (4L, 2L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(out(2L) == ((Some(10L), Some(50L), None, 2L))) // purchase@40 < click@50
    assert(out(3L) == ((Some(5L), None, None, 1L)))
    assert(!out.contains(4L)) // funnel starts at step 1
  }

  test("funnel: step time can equal the previous step's (>= bound)") {
    import spark.implicits._
    val e = Seq((1L, 10L, "view"), (1L, 10L, "click")).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(e, "user_id", "ts", "event_type", Seq("view", "click"))
      .collect()(0)
    assert(out.getLong(1) == 10L && out.getLong(2) == 10L && out.getLong(3) == 2L)
  }

  test("transitionCounts: lead in (ts, tie) order, per-user boundaries respected") {
    import spark.implicits._
    val e = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 2L, 3L, "c"), // tie on ts=2: id order
      (2L, 9L, 4L, "a"))                                       // no next -> no row
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.transitionCounts(e, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 1L, ("b", "c") -> 1L))
  }

  test("pqCodes: codewords encode themselves as themselves; codes are valid ids") {
    import spark.implicits._
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => (i * 7 + j * 3).toFloat % 11)))
      .toDF("vec_id", "embedding")
    val codes = Similarity.pqCodes(vecs, 8, 2, 10) // codewords: ids 0,10,20,30
    val byVec = codes.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byVec.size == 40 * 2)
    // a codeword's nearest codeword in every subspace is itself (distance 0)
    for (cw <- Seq(0L, 10L, 20L, 30L); s <- Seq(0L, 1L))
      assert(byVec((cw, s)) == cw, s"codeword $cw sub $s")
    assert(byVec.values.forall(c => c % 10 == 0))
  }

  test("canonicalPerCluster: highest score survives, ties to smallest id") {
    import spark.implicits._
    val labeled = Seq(
      (1L, 100L, 5L), (2L, 100L, 9L), (3L, 100L, 9L), // tie at 9 -> id 2
      (7L, 200L, 1L))
      .toDF("doc_id", "cluster_id", "score")
    val out = Dedup.canonicalPerCluster(labeled, "doc_id", "cluster_id", "score")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(100L -> ((2L, 9L, 3L)), 200L -> ((7L, 1L, 1L))))
  }

  test("bitstringDupPairs: exact hamming verify, pigeonhole lossless vs naive") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def flip(h: String, ks: Seq[Int]): String = {
      val a = h.toCharArray
      ks.foreach(k => a(k) = if (a(k) == '0') '1' else '0')
      new String(a)
    }
    val base = Seq.fill(64)(if (rnd.nextBoolean()) '1' else '0').mkString
    val far = Seq.fill(64)(if (rnd.nextBoolean()) '1' else '0').mkString
    val hs = Seq(
      0L -> base, 1L -> base, // hamming 0
      2L -> flip(base, Seq(5)), // 1 bit from base
      3L -> flip(base, Seq(1, 17, 33, 49)), // 4 bits — one per segment: OUT at T=3
      4L -> flip(base, Seq(2, 3, 4)), // 3 bits in one segment: IN
      5L -> far).toDF("doc_id", "dhash")
    val got = Dedup.bitstringDupPairs(hs, "doc_id", "dhash", 64, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // naive truth over all pairs
    val rows = Seq(0L -> base, 1L -> base, 2L -> flip(base, Seq(5)),
      3L -> flip(base, Seq(1, 17, 33, 49)), 4L -> flip(base, Seq(2, 3, 4)), 5L -> far)
    val naive = (for {
      (i, a) <- rows; (j, b) <- rows if i < j
      d = a.zip(b).count { case (x, y) => x != y } if d <= 3
    } yield (i, j) -> d.toLong).toMap
    assert(got == naive, s"got $got expected $naive")
    assert(got((0L, 1L)) == 0L && got((0L, 2L)) == 1L && got((0L, 4L)) == 3L)
    assert(!got.contains((0L, 3L))) // 4 bits: correctly outside the radius
    // degenerate config guard: bits=64, maxHamming=0 → one 64-bit segment
    // overflows conv's signed-LONG output; hamming would null and every
    // pair silently vanish — must fail loudly at require instead
    val ex = intercept[IllegalArgumentException] {
      Dedup.bitstringDupPairs(hs, "doc_id", "dhash", 64, 0)
    }
    assert(ex.getMessage.contains("62"))
  }

  test("linkagePairs: multi-pass blocking recovers prefix-breaking typos; exacts gate") {
    import spark.implicits._
    val recs = Seq(
      (1L, "alpha bravo 11", 5L, "A"),
      (2L, "lpha bravo 11", 5L, "A"),   // first char dropped: prefix block broken
      (3L, "alpha bravo 1", 5L, "A"),   // last char dropped: suffix block broken
      (4L, "alpha bravo 11", 9L, "A"),  // name identical, nation differs: NOT linked
      (5L, "delta hotel 22", 5L, "A"),  // unrelated
      (6L, "alpha bravo 11", 5L, "B")   // segment differs: NOT linked
    ).toDF("rec_id", "name", "nation", "segment")
    val passes = Seq(substring(col("name"), 1, 2),
      org.apache.spark.sql.functions.expr("right(name, 2)"))
    val got = Dedup.linkagePairs(recs, "rec_id", "name",
        Seq("nation", "segment"), passes, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 1-2 only share the SUFFIX block, 1-3 only the PREFIX block — each
    // found via exactly one pass; 2-3 differ by 2 edits (out)
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L), got.toString)
    // prefix-only blocking misses the first-char typo — the multi-pass
    // union is load-bearing, not decorative
    val prefixOnly = Dedup.linkagePairs(recs, "rec_id", "name",
        Seq("nation", "segment"), passes.take(1), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefixOnly == Set((1L, 3L)), prefixOnly.toString)
    // plan: candidates come from an equi-join, never a nested loop
    val plan = Dedup.linkagePairs(recs, "rec_id", "name",
      Seq("nation", "segment"), passes, 1).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      plan)
  }

  test("qualityCanonical: kept member beats a longer filtered one; counts audit") {
    import spark.implicits._
    val labeled = Seq(
      // cluster 100: doc 2 is longer but filtered — kept doc 1 must win
      (1L, 100L, true, 50L), (2L, 100L, false, 99L), (3L, 100L, true, 40L),
      // cluster 200: nobody kept — longest member wins, kept_is_kept false
      (7L, 200L, false, 10L), (8L, 200L, false, 20L),
      // cluster 300: kept tie on score — smallest id
      (10L, 300L, true, 30L), (11L, 300L, true, 30L))
      .toDF("doc_id", "cluster_id", "is_kept", "n_tokens")
    val out = Dedup.qualityCanonical(labeled, "doc_id", "cluster_id",
        "is_kept", "n_tokens")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      100L -> ((1L, true, 50L, 3L, 2L)),
      200L -> ((8L, false, 20L, 2L, 0L)),
      300L -> ((10L, true, 30L, 2L, 2L))))
  }
}
