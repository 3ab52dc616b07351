package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Graph.pageRank]] + [[Cdc.applyChanges]] + [[Dedup.editDistanceDupPairs]]. */
class GraphCdcSpec extends SparkSpec {

  private def edges(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  test("pageRank: a cycle is a fixed point at 1/N") {
    val r = Graph.pageRank(edges(1L -> 2L, 2L -> 3L, 3L -> 1L), "src", "dst", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // base 150000000 div 3 + 850000000 * 333333333 div 1e9 = 333333333
    assert(r == Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L))
  }

  test("pageRank: in-degree concentrates mass; teleport keeps floors") {
    // a <- b, a <- c, a -> b : node a aggregates b+c, c only teleports
    val r = Graph.pageRank(edges(1L -> 2L, 2L -> 1L, 3L -> 1L), "src", "dst", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L), r)
    assert(r(3L) == 50000000L) // exactly the teleport base, no inflow
    assert(r.values.sum <= 1000000000L) // floor truncation only loses mass
  }

  test("personalizedPageRank: mass flows from seeds only; hand-computed one round") {
    // cycle 1→2→3→1 plus disconnected 10→11; seed = {1}
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 10L -> 11L)
    val r = Graph.personalizedPageRank(g, "src", "dst", Seq(1L), 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // r0: node1 = 1e9, rest 0. One round: node1 teleport 150000000;
    // node2 inflow = 850000000·1e9 div 1e9; everything else untouched
    assert(r == Map(1L -> 150000000L, 2L -> 850000000L, 3L -> 0L,
      10L -> 0L, 11L -> 0L), r)
    // components unreachable from the seeds stay at exactly zero forever
    val r3 = Graph.personalizedPageRank(g, "src", "dst", Seq(1L), 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r3(10L) == 0L && r3(11L) == 0L)
    assert(r3(1L) > 0L && r3(2L) > 0L && r3(3L) > 0L)
    // and the seeded walk is partitioning-invariant like g1's
    val again = Graph.personalizedPageRank(g.repartition(5), "src", "dst", Seq(1L), 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == r3)
  }

  test("pageRank is partitioning-invariant (exact integer ranks)") {
    val e = edges((0L until 60L).flatMap(i => Seq(i -> (i * 7 + 1) % 60, i -> (i * 11 + 3) % 60)): _*)
    val a = Graph.pageRank(e, "src", "dst", 3).collect().toSet
    val b = Graph.pageRank(e.repartition(7), "src", "dst", 3).collect().toSet
    assert(a == b)
  }

  test("triangleCounts: K4 has 3 per node; direction/duplicate edges don't double-count") {
    // K4 (complete graph on 4 nodes): C(3,2)=3 triangles per node — feed
    // it with mixed directions and a duplicate edge
    val k4 = edges(1L -> 2L, 2L -> 1L, 1L -> 3L, 1L -> 4L, 2L -> 3L,
      3L -> 2L, 2L -> 4L, 3L -> 4L)
    val out = Graph.triangleCounts(k4, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a triangle-free path emits nothing
    assert(Graph.triangleCounts(edges(1L -> 2L, 2L -> 3L, 3L -> 4L), "src", "dst")
      .count() == 0)
  }

  test("skipgramCounts: window offsets, ordering, threshold and top-k ties") {
    import spark.implicits._
    val df = Seq.fill(5)("a b c").toDF("text")
    // offsets 1..2 over "a b c": (a,b) (b,c) at o=1; (a,c) at o=2 — x5 docs
    val out = Curation.skipgramCounts(df, "text", 2, 5L, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 5L, ("b", "c") -> 5L, ("a", "c") -> 5L))
    // threshold: below minCount drops out
    val thin = Curation.skipgramCounts(df, "text", 2, 6L, 10).count()
    assert(thin == 0)
  }

  test("applyChanges: upsert, delete, insert, latest-wins, seq tiebreak, NULL overwrite") {
    import spark.implicits._
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (5L, "e", 50L))
      .toDF("k", "s", "v")
    val changes = Seq(
      // k=2: two changes, later ts wins
      (2L, "U", 100L, 1L, Option("b1"), 21L),
      (2L, "U", 200L, 1L, Option("b2"), 22L),
      // k=3: delete
      (3L, "D", 100L, 1L, Option("x"), 0L),
      // k=4: insert (absent from snapshot)
      (4L, "I", 100L, 1L, Option("d"), 40L),
      // k=5: same ts, seq decides; winner nulls the string column
      (5L, "U", 100L, 2L, None, 52L),
      (5L, "U", 100L, 1L, Option("e1"), 51L))
      .toDF("k", "op", "ts", "seq", "s", "v")
    val out = Cdc.applyChanges(snap, changes, "k", "ts", "seq", "op")
      .collect().map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((Some("a"), 10L)),   // untouched
      2L -> ((Some("b2"), 22L)),  // latest ts
      4L -> ((Some("d"), 40L)),   // inserted
      5L -> ((None, 52L))))       // seq tiebreak; NULL not resurrected
  }

  test("scd2History: versions close at the next change; deletes close-only; same-ts supersession") {
    import spark.implicits._
    val changes = Seq(
      // k=2: two versions, the first closes at ts 200
      (2L, "U", 100L, 1L, Option("b1"), 21L),
      (2L, "U", 200L, 1L, Option("b2"), 22L),
      // k=3: one version, then a delete closes it — no delete row emitted
      (3L, "U", 100L, 1L, Option("c1"), 31L),
      (3L, "D", 300L, 1L, Option("x"), 0L),
      // k=5: same ts, seq 1 superseded instantly → zero-length interval
      (5L, "U", 100L, 2L, None, 52L),
      (5L, "U", 100L, 1L, Option("e1"), 51L))
      .toDF("k", "op", "ts", "seq", "s", "v")
    val out = Cdc.scd2History(changes.repartition(3), "k", "ts", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getBoolean(6))).sortBy(t => (t._1, t._2, t._4))
    assert(out.toSeq == Seq(
      (2L, 100L, Some(200L), 1L, false),
      (2L, 200L, None, 1L, true),
      (3L, 100L, Some(300L), 1L, false),   // closed by the delete, not current
      (5L, 100L, Some(100L), 1L, false),   // zero-length: superseded same-ts
      (5L, 100L, None, 2L, true)))
  }

  test("bitemporalHistory: retroactive correction restates under a new tx, audit trail survives") {
    import spark.implicits._
    val changes = Seq(
      // k=2: batch 1 writes two versions; batch 2 retroactively corrects
      // the FIRST version (same valid ts 100, higher seq)
      (2L, "U", 100L, 1L, 1L, "b1", 21L),
      (2L, "U", 200L, 1L, 1L, "b2", 22L),
      (2L, "U", 100L, 2L, 2L, "b1fix", 29L),
      // k=3: single batch, version then delete — delete closes, no row
      (3L, "U", 100L, 1L, 1L, "c1", 31L),
      (3L, "D", 300L, 1L, 1L, "x", 0L))
      .toDF("k", "op", "ts", "seq", "tx", "s", "v")
    val hist = Cdc.bitemporalHistory(changes.repartition(3),
      "k", "ts", "seq", "op", "tx")
    val out = hist.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getLong(6), Option(r.get(7)).map(_.asInstanceOf[Long]),
        r.getBoolean(8)))
      .sortBy(t => (t._1, t._5, t._3, t._2)).toSeq
    assert(out == Seq(
      // k=2 as-of tx 1: the ORIGINAL timeline, tx interval closed by tx 2
      (2L, "b1", 100L, Some(200L), 1L, Some(2L), false),
      (2L, "b2", 200L, None, 1L, Some(2L), false),
      // k=2 as-of tx 2: b1 superseded same-ts (zero-length), fix spans
      (2L, "b1", 100L, Some(100L), 2L, None, false),
      (2L, "b1fix", 100L, Some(200L), 2L, None, false),
      (2L, "b2", 200L, None, 2L, None, true),
      // k=3: one restatement, closed by the delete
      (3L, "c1", 100L, Some(300L), 1L, None, false)), out.toString)
    // point-in-time: what did we believe at tx 1 about valid time 150?
    val asOf = Cdc.asOfBitemporal(hist, lit(1L), lit(150L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(asOf == Seq((2L, "b1"), (3L, "c1")))
    // ...and at tx 2 the correction has replaced b1
    val asOf2 = Cdc.asOfBitemporal(hist, lit(2L), lit(150L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(asOf2 == Seq((2L, "b1fix"), (3L, "c1")))
  }

  test("applyChanges rejects changes missing snapshot columns") {
    import spark.implicits._
    val snap = Seq((1L, "a")).toDF("k", "s")
    val ch = Seq((1L, "U", 1L, 1L)).toDF("k", "op", "ts", "seq")
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(snap, ch, "k", "ts", "seq", "op")
    }
  }

  test("incrementalAgg: equals full recompute; zero-count keys drop; over-delete surfaces") {
    import spark.implicits._
    // base rows: k1 ×3 (v 10,20,30), k2 ×1 (v 5), k3 ×2 (v 7,8)
    val baseRows = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 5L), (3L, 7L), (3L, 8L))
    val baseAgg = baseRows.toDF("k", "v").groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("sum_v"))
    // delta: insert k1 +40, k4 +100; delete k1 -20, both k3 rows
    val delta = Seq(("I", 1L, 40L), ("I", 4L, 100L), ("D", 1L, 20L),
      ("D", 3L, 7L), ("D", 3L, 8L)).toDF("op", "k", "v")
    val got = Cdc.incrementalAgg(baseAgg, delta, "k", "op", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // recompute truth: k1 {10,30,40}, k2 {5}, k3 gone (count 0), k4 {100}
    assert(got == Seq((1L, 3L, 80L), (2L, 1L, 5L), (4L, 1L, 100L)), got.toString)
    // over-delete: deleting from a key the base never had surfaces as a
    // NEGATIVE count — visible corruption, never silently clamped
    val bad = Seq(("D", 9L, 50L)).toDF("op", "k", "v")
    val neg = Cdc.incrementalAgg(baseAgg, bad, "k", "op", "v")
      .filter(col("k") === 9L).collect()
    assert(neg.length == 1 && neg(0).getLong(1) == -1L && neg(0).getLong(2) == -50L)
    // malformed op fails loudly, never skips
    val ex = intercept[Exception] {
      Cdc.incrementalAgg(baseAgg,
        Seq(("X", 1L, 1L)).toDF("op", "k", "v"), "k", "op", "v").collect()
    }
    assert(ex.getMessage.contains("unknown op") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown op")), ex.getMessage)
  }

  test("IVM fuzz: random I/D logs — maintained == recompute for agg AND distinct") {
    import spark.implicits._
    // deterministic pseudo-random log: inserts drawn first, deletes only
    // ever delete a previously-inserted surviving row (well-formed CDC)
    val rnd = new scala.util.Random(1234)
    val nKeys = 7
    val live = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val baseRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val deltaRows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    for (_ <- 1 to 400) {
      val r = (rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong)
      baseRows += r; live += r
    }
    for (_ <- 1 to 300) {
      if (live.nonEmpty && rnd.nextInt(3) == 0) {
        val i = rnd.nextInt(live.size)
        val (k, v) = live.remove(i)
        deltaRows += (("D", k, v))
      } else {
        val r = (rnd.nextInt(nKeys).toLong, rnd.nextInt(20).toLong)
        live += r; deltaRows += (("I", r._1, r._2))
      }
    }
    val baseDf = baseRows.toSeq.toDF("k", "v")
    val delta = deltaRows.toSeq.toDF("op", "k", "v")
    // agg view
    val baseAgg = baseDf.groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("sum_v"))
    val gotAgg = Cdc.incrementalAgg(baseAgg, delta, "k", "op", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val wantAgg = live.groupBy(_._1).map { case (k, rs) =>
      (k, rs.size.toLong, rs.map(_._2).sum)
    }.toSeq.sorted
    assert(gotAgg == wantAgg)
    // distinct view via the support multiset
    val baseVc = baseDf.groupBy("k", "v")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    val gotD = Cdc.incrementalDistinct(baseVc, delta, "k", "op", "v")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("nd"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val wantD = live.groupBy(_._1).map { case (k, rs) =>
      (k, rs.map(_._2).distinct.size.toLong)
    }.toSeq.sorted
    assert(gotD == wantD)
  }

  test("incrementalDistinct: deleted copy keeps the value while siblings survive") {
    import spark.implicits._
    // k1 has value 10 TWICE and 20 once; k2 has 5 once
    val baseVc = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 5L))
      .toDF("k", "v").groupBy("k", "v")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    // delete ONE copy of (1,10): the value must survive (cnt 2 -> 1);
    // delete (2,5) entirely: k2's support empties; insert (1,30)
    val delta = Seq(("D", 1L, 10L), ("D", 2L, 5L), ("I", 1L, 30L))
      .toDF("op", "k", "v")
    val vc = Cdc.incrementalDistinct(baseVc, delta, "k", "op", "v")
    val got = vc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == Seq((1L, 10L, 1L), (1L, 20L, 1L), (1L, 30L, 1L)), got.toString)
    // the derived distinct view: k1 -> 3 distinct, k2 gone — where naive
    // aggregate folding of "distinct -= 1 per delete" would report 2
    val dv = vc.groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("nd"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dv == Seq((1L, 3L)), dv.toString)
  }

  test("editDistanceDupPairs: verified distances, threshold, prefix recall bound, block cap") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base + " x"),            // distance 2 from 1
      (3L, base + " zz yy ww qq"),  // distance 12 from 1 — above maxDist
      (4L, "completely different prefix but same tail " + base),
      (10L, "aa " + base),          // prefix differs from 1 in first chars
      (20L, "boiler " + base), (21L, "boiler " + base + " y"),
      (22L, "boiler " + base + " z"), (23L, "boiler " + base + " w w"))
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistanceDupPairs(df, "text", "doc_id", 32, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 2L)
    assert(!pairs.contains((1L, 3L)))  // above threshold
    assert(!pairs.contains((1L, 4L)))  // different prefix block (recall bound)
    assert(!pairs.contains((1L, 10L))) // prefix edit is invisible by design
    assert(pairs((20L, 21L)) == 2L && pairs((21L, 22L)) == 1L)
    // block cap: the four-member "boiler" block vanishes at maxBlock=3,
    // the three-member block of 1/2/3 survives
    val capped = Dedup.editDistanceDupPairs(df, "text", "doc_id", 32, 10, maxBlock = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
  }

  test("bfsDistances: exact hop counts on a path; unreached stays null") {
    // path 1-2-3-4-5 plus isolated pair 8-9; sources {1}
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 8L -> 9L)
    val r = Graph.bfsDistances(e, "src", "dst", Seq(1L), 3)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(r(1L) == Some(0L) && r(2L) == Some(1L) && r(3L) == Some(2L))
    assert(r(4L) == Some(3L))
    assert(r(5L).isEmpty, "beyond the 3-hop radius")
    assert(r(8L).isEmpty && r(9L).isEmpty, "disconnected component")
    // multi-source takes the nearest
    val m = Graph.bfsDistances(e, "src", "dst", Seq(1L, 5L), 3)
      .collect().filterNot(_.isNullAt(1))
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(m(3L) == 2L && m(4L) == 1L && m(5L) == 0L)
  }

  test("clusteringCoeff: clique scores 1, path interior 0, deg<2 guarded") {
    // K4 on 1-4 plus a pendant 5-1: the K4 corners stay cliquish, the
    // pendant has deg 1 (guarded zero), node 1 dilutes to 3/(5*4/2)
    val e = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L, 5L -> 1L)
    val r = Graph.clusteringCoeff(e, "src", "dst")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(2L) == ((3L, 3L, 1.0)) && r(3L) == ((3L, 3L, 1.0)) && r(4L) == ((3L, 3L, 1.0)))
    assert(r(1L) == ((4L, 3L, 0.5))) // 2*3 / (4*3)
    assert(r(5L) == ((1L, 0L, 0.0)))
  }

  test("labelPropagation: dense blocks keep distinct labels across a bridge") {
    // two triangles {0,1,2} and {3,4,5} joined by the single edge 2-3:
    // each triangle's majority must win; the bridge must not merge them
    val e = edges(0L -> 1L, 1L -> 2L, 0L -> 2L, 3L -> 4L, 4L -> 5L, 3L -> 5L, 2L -> 3L)
    val r = Graph.labelPropagation(e, "src", "dst", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(r(_) == 0L), r)
    assert(Seq(3L, 4L, 5L).forall(r(_) == 3L), r)
  }

  test("labelPropagation: a star converges to the min member, no oscillation") {
    val star = edges(1L -> 9L, 2L -> 9L, 3L -> 9L)
    // round 1: each leaf ties {hub, self} and keeps its min; the hub ties
    // across all leaves and adopts 1
    val r1 = Graph.labelPropagation(star, "src", "dst", 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r1 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 9L -> 1L), r1)
    // round 2: leaves follow the hub's label; everyone stays at 1 after —
    // the self-loop tally is what stops the classic hub<->leaf flip-flop
    for (rounds <- 2 to 4) {
      val r = Graph.labelPropagation(star, "src", "dst", rounds)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L), s"rounds=$rounds: $r")
    }
  }

  test("labelPropagation is partitioning-invariant") {
    val e = edges((0L until 40L).map(i => i -> (i - i % 5)): _*)
    val a = Graph.labelPropagation(e, "src", "dst", 3).collect().toSet
    val b = Graph.labelPropagation(e.repartition(7), "src", "dst", 3).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("hits: pure hub and pure authority separate; hand-computed one round") {
    import spark.implicits._
    // 0→2, 1→2: node 2 is the sole authority, 0/1 pure hubs
    val e = Seq((0L, 2L), (1L, 2L)).toDF("src", "dst")
    val r = Graph.hits(e, "src", "dst", iters = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq
    // h0 = 1e9 div 3 = 333333333 each.
    // araw(2) = 2·333333333; rescale → a(2) = 1e9, a(0)=a(1)=0.
    // hraw(0) = hraw(1) = 1e9; rescale → h = 1e9·1e9 div 2e9 = 5e8.
    assert(r == Seq((0L, 500000000L, 0L), (1L, 500000000L, 0L),
      (2L, 0L, 1000000000L)), r.toString)
  }

  test("hits: a directory page is a top hub with zero authority; mass conserved") {
    import spark.implicits._
    // "directory" 9 links to every leaf; leaves link each other sparsely
    val dir9 = (0L until 6L).map(v => (9L, v))
    val chain = (0L until 5L).map(v => (v, v + 1))
    val e = (dir9 ++ chain).toDF("src", "dst")
    val out = Graph.hits(e, "src", "dst", iters = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    val byId = out.map(t => t._1 -> t).toMap
    // the directory out-links dominate every chain node's single out-link
    assert(out.forall { case (id, h, _) => id == 9L || h <= byId(9L)._2 })
    assert(byId(9L)._3 == 0L) // nothing links TO the directory
    // L1 mass ≈ 1e9 per axis minus truncation dust (< 1 nano per node)
    val hubMass = out.map(_._2).sum
    val authMass = out.map(_._3).sum
    assert(hubMass > 1000000000L - out.length && hubMass <= 1000000000L)
    assert(authMass > 1000000000L - out.length && authMass <= 1000000000L)
  }

  test("hits is partitioning-invariant (integer fixed point)") {
    import spark.implicits._
    val e = (0 until 60).map(i => (i.toLong % 13, (i * 7 + 3).toLong % 13))
      .toDF("src", "dst")
    def run(parts: Int) = Graph.hits(e.repartition(parts), "src", "dst", 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run(2) == run(11))
  }

  test("modularity: two triangles + one bridge, hand-computed; random labels near zero") {
    import spark.implicits._
    // two triangles {0,1,2}, {3,4,5} joined by bridge 2-3: m = 7
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L),
      (2L, 3L)).toDF("src", "dst")
    val goodLbl = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("node_id", "label")
    val out = Graph.modularity(e, goodLbl, "src", "dst", "node_id", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1).toSeq
    // M2 = 14; per community: E2_in = 6, d_tot = 7
    // Q = 2·(6·14 − 49)/196 = 70/196 = 0.357143
    assert(out == Seq((0L, 3L, 6L, 7L, 0.357143), (1L, 3L, 6L, 7L, 0.357143)),
      out.toString)
    // everything-in-one-community scores exactly 0 (E2 = M2, d = M2)
    val oneLbl = (0L to 5L).map((_, 9L)).toDF("node_id", "label")
    val q1 = Graph.modularity(e, oneLbl, "src", "dst", "node_id", "label")
      .head().getDouble(4)
    assert(q1 == 0.0)
    // cutting ACROSS the triangles scores worse than the good split
    val badLbl = Seq((0L, 0L), (1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L))
      .toDF("node_id", "label")
    val qBad = Graph.modularity(e, badLbl, "src", "dst", "node_id", "label")
      .head().getDouble(4)
    assert(qBad < 0.357143, s"bad split should score lower, got $qBad")
  }

  test("kCore: tail peels in cascade, clique survives, convergence gated") {
    // 4-clique (degree 3 each) with a 3-node pendant chain hanging off it
    val e = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L,
      4L -> 5L, 5L -> 6L, 6L -> 7L)
    val core = Graph.kCore(e, "src", "dst", 3, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=3 core: exactly the clique, every member back at degree 3
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // the chain forces 3 shrinking rounds (7 then 6 then 5 peel); a
    // 2-round budget cannot reach the fixpoint proof and must throw
    val ex = intercept[IllegalArgumentException] {
      Graph.kCore(e, "src", "dst", 2, 2).collect()
    }
    assert(ex.getMessage.contains("fixpoint"))
    // k=2: clique + nothing of the chain (ends peel inward completely)
    val k2 = Graph.kCore(e, "src", "dst", 2, 6)
      .collect().map(_.getLong(0)).toSet
    assert(k2 == Set(1L, 2L, 3L, 4L))
  }

  test("linkPrediction: path + square hand case; directed dups collapse; edges excluded") {
    import spark.implicits._
    // path 1–2–3 and square 4–5–6–7; (2,1) is a redundant reverse edge
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 1L),
      (4L, 5L), (5L, 6L), (6L, 7L), (4L, 7L)).toDF("src", "dst")
    val got = Graph.linkPrediction(edges, "src", "dst", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val aa = math.round(1e6 / math.log(2.0)) // every wedge center has deg 2
    // square diagonals share TWO centers; the path endpoints share one;
    // no existing edge appears
    assert(got == Seq(
      (4L, 6L, 2L, 2 * aa), (5L, 7L, 2L, 2 * aa), (1L, 3L, 1L, aa)),
      got.toString)
  }

  test("incrementalMinMax: deleted minimum resurrects its successor; over-delete audited") {
    import spark.implicits._
    // key A support: 1×1, 2×2, 9×1 — min 1, max 9
    val base = Seq(("A", 1L, 1L), ("A", 2L, 2L), ("A", 9L, 1L))
      .toDF("k", "v", "cnt")
    // delete the minimum AND the maximum; insert a new high
    val delta = Seq(("D", "A", 1L), ("D", "A", 9L), ("I", "A", 5L))
      .toDF("op", "k", "v")
    val r = Cdc.incrementalMinMax(base, delta, "k", "op", "v").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 5L, 2L, 0L)), r.toString) // min resurrects 2, max falls to 5
    // an over-delete of a value never present: extrema unpoisoned,
    // corruption surfaced in n_negative
    val bad = Seq(("D", "A", 777L)).toDF("op", "k", "v")
    val r2 = Cdc.incrementalMinMax(base, bad, "k", "op", "v").head()
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(4)) == ((1L, 9L, 1L)),
      r2.toString)
  }

  test("pointInTimeJoin: version valid at the fact ts; gaps and pre-history NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key 1: v1 [10, 20), v2 [20, ∞); key 2: one closed version [10, 30)
    // (a delete gap after 30); key 3: same-ts supersession — v(seq1)
    // zero-length [10, 10), v(seq2) [10, ∞)
    val hist = Seq(
      (1L, "v1", 10L, Some(20L)), (1L, "v2", 20L, None),
      (2L, "w1", 10L, Some(30L)),
      (3L, "z1", 10L, Some(10L)), (3L, "z2", 10L, None)
    ).toDF("k", "ver", "valid_from", "valid_to")
    val facts = Seq(
      (1L, 15L), (1L, 20L), (1L, 25L), // v1, v2 (half-open), v2
      (2L, 35L),                       // delete gap -> NULL
      (3L, 10L),                       // zero-length v never matches -> z2
      (4L, 10L), (1L, 5L)              // unknown key / pre-history -> NULL
    ).toDF("k", "ts")
    val got = Cdc.pointInTimeJoin(facts, hist, "k", "ts")
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 5L, null), (1L, 15L, "v1"), (1L, 20L, "v2"), (1L, 25L, "v2"),
      (2L, 35L, null), (3L, 10L, "z2"), (4L, 10L, null)), got.toString)
    // SCD2 disjointness means no fanout: row count == fact count
    assert(Cdc.pointInTimeJoin(facts, hist, "k", "ts").count() == facts.count())
  }

  private def mergeFixture() = {
    import spark.implicits._
    val target = Seq((1L, 100L, "A"), (2L, 200L, "B"), (3L, 300L, "C"))
      .toDF("k", "bal", "seg")
    val source = Seq((2L, 50L, false), (3L, 75L, true), (9L, 999L, false))
      .toDF("k", "amt", "churn")
    (target, source)
  }

  test("mergeInto: delete beats update; partial update keeps unset columns") {
    import org.apache.spark.sql.functions.{col, lit}
    val (t, s) = mergeFixture()
    val got = Cdc.mergeInto(t, s, Seq("k"),
      matchedDeleteCond = Some(col("s.churn")),
      matchedUpdate = Some((None, Map("bal" -> (col("t.bal") + col("s.amt"))))),
      notMatchedInsert = Some((None, Map("bal" -> col("s.amt"), "seg" -> lit("NEW")))))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 100L, "A"),   // target-only: survives untouched
      (2L, 250L, "B"),   // matched update: bal += amt, seg KEPT
      (9L, 999L, "NEW")  // not matched: inserted
    ), got.toString)     // k=3 matched the delete clause FIRST — gone
  }

  test("mergeInto: conditional insert filters; unassigned insert columns NULL") {
    import org.apache.spark.sql.functions.col
    val (t, s) = mergeFixture()
    val got = Cdc.mergeInto(t, s, Seq("k"),
      notMatchedInsert = Some((Some(col("s.amt") > 500L), Map("bal" -> col("s.amt")))))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    // no matched clauses: every matched/target-only row survives as-is;
    // only the amt>500 unmatched source row inserts, seg defaults NULL
    assert(got == Seq((1L, 100L, "A"), (2L, 200L, "B"), (3L, 300L, "C"),
      (9L, 999L, null)), got.toString)
  }

  test("mergeInto: cardinality violation raises; validate=false permits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (t, _) = mergeFixture()
    val dup = Seq((2L, 10L, false), (2L, 20L, false)).toDF("k", "amt", "churn")
    intercept[IllegalArgumentException] {
      Cdc.mergeInto(t, dup, Seq("k"),
        matchedUpdate = Some((None, Map("bal" -> col("s.amt")))))
    }
    // skipping validation is the caller's explicit contract
    val n = Cdc.mergeInto(t, dup, Seq("k"),
      matchedUpdate = Some((None, Map("bal" -> col("s.amt")))),
      validate = false).count()
    assert(n >= 3)
  }
}
