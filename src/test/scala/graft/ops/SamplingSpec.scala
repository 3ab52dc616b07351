package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("withSplit: total partition, deterministic across runs, ~weights") {
    val split = Sampling.withSplit(ids(2000), "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test")) // no nulls at 100%
    assert(counts.values.sum == 2000)
    // uniform-hash tolerance: ±5 percentage points at n=2000
    assert(math.abs(counts("train") - 1600L) < 100, counts)
    assert(math.abs(counts("val") - 200L) < 100, counts)
    // determinism: a second evaluation assigns identically
    val again = Sampling.withSplit(ids(2000), "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("withSplit: weights below 100 leave a null remainder") {
    val split = Sampling.withSplit(ids(500), "id", Seq("a" -> 50))
    val n = split.filter(col("split").isNull).count()
    assert(n > 0 && n < 500)
  }

  test("sampleByHash is a subset and matches the bucket rule") {
    val s = Sampling.sampleByHash(ids(1000), "id", 10)
    val n = s.count()
    assert(n > 50 && n < 200, n)
    // idempotent: sampling the sample at 100% changes nothing
    assert(Sampling.sampleByHash(s, "id", 100).count() == n)
  }

  test("packTexts concatenates members in offset order regardless of partitioning") {
    import spark.implicits._
    val df = Seq((1L, "aa", 2L), (2L, "bb", 2L), (3L, "cc", 2L), (4L, "dd", 2L))
      .toDF("doc_id", "text", "n_tok")
      .repartition(5) // adversarial arrival order for collect_list
    val packed = Sampling.packShards(df, "doc_id", "n_tok", 100L, 1)
    val out = Sampling.packTexts(packed, "doc_id", "text").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("packed_text") == "aa bb cc dd")
    assert(out(0).getAs[Int]("n_docs") == 4)
  }

  test("withSplit is a narrow plan — no shuffle") {
    val plan = Sampling.withSplit(ids(100), "id", Seq("a" -> 50, "b" -> 50))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("mixToTarget: binding group kept whole, others thinned toward the mix") {
    import spark.implicits._
    // sizes 150/100/50, targets 0.5/0.25/0.25 -> K = min(300, 400, 200) =
    // 200 -> expected keeps (100, 50, 50): c is the binding group (rate 1,
    // kept EXACTLY whole); a and b are hash-thinned approximations
    val df = ((1L to 150L).map((_, "a")) ++ (201L to 300L).map((_, "b")) ++
      (401L to 450L).map((_, "c"))).toDF("id", "g")
    val kept = Sampling.mixToTarget(df, "g", "id",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("c") == 50L, s"binding group not kept whole: $kept")
    assert(math.abs(kept("a") - 100L) <= 25, s"group a far off target: $kept")
    assert(math.abs(kept("b") - 50L) <= 20, s"group b far off target: $kept")
  }

  test("mixByTemperature (alpha=0.5): rare group kept whole, dominant group thinned") {
    import spark.implicits._
    // sizes 400/100 -> sqrt weights 2:1 -> p = (2/3, 1/3) -> K = 300:
    // the rare group binds (rate 1, kept exactly whole), the dominant
    // group thins to ~200 — the multilingual up-weighting effect
    val df = ((1L to 400L).map((_, "big")) ++ (1001L to 1100L).map((_, "rare")))
      .toDF("id", "g")
    val kept = Sampling.mixByTemperature(df, "g", "id", 0.5)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") == 100L, s"rare group not kept whole: $kept")
    assert(math.abs(kept("big") - 200L) <= 40, s"dominant group off target: $kept")
  }

  test("mixToTarget: deterministic, monotone under target growth, drops untargeted groups") {
    import spark.implicits._
    val df = ((1L to 80L).map((_, "a")) ++ (101L to 140L).map((_, "b")) ++
      (201L to 210L).map((_, "zz"))).toDF("id", "g")
    def keptIds(t: Map[String, Double]): Set[Long] =
      Sampling.mixToTarget(df, "g", "id", t).select("id")
        .collect().map(_.getLong(0)).toSet
    val small = keptIds(Map("a" -> 0.8, "b" -> 0.2))
    assert(small == keptIds(Map("a" -> 0.8, "b" -> 0.2)), "not deterministic")
    assert(!small.exists(_ >= 201L), "untargeted group leaked through")
    // raising b's share (b becomes less binding for a... a's rate can only
    // grow or shrink monotonically per group): every kept id in a group
    // whose rate grew stays kept (hash-threshold monotonicity)
    val grown = keptIds(Map("a" -> 0.9, "b" -> 0.1))
    val aIds = (1L to 80L).toSet
    assert((small & aIds).subsetOf(grown & aIds),
      "rate growth must not evict previously kept rows")
  }

  test("withGlobalIndex: dense 0..n-1 in key order, partitioning-independent") {
    import spark.implicits._
    // shuffled insert order + skewed input partitioning — the index must
    // still be the rank in key order
    val keys = scala.util.Random.shuffle((0L until 200L).toList)
    val df = keys.map(k => (k, s"v$k")).toDF("k", "v")
    def run(parts: Int) =
      Sampling.withGlobalIndex(df.repartition(parts), "k")
        .select("k", "global_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(3)
    assert(got == (0L until 200L).map(k => k -> k).toMap,
      "global_id must equal rank in key order")
    assert(run(11) == got, "index must not depend on input partitioning")
  }

  test("weightedSample: deterministic, drops w<=0, heavy weights dominate") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, if (i == 7L) 1000000000L else 1L))
      .toDF("id", "w")
    val top = Sampling.weightedSample(df, "id", "w", 5).collect()
    // weight 1e9 compresses the key to ~0, beating every unit-weight key
    assert(top.head.getLong(0) == 7L)
    assert(top.length == 5)
    val again = Sampling.weightedSample(df, "id", "w", 5)
      .collect().map(_.getLong(0)).toSeq
    assert(again == top.map(_.getLong(0)).toSeq, "sample must be run-stable")
    // zero/negative weights never sampled even at k >= n
    val withZero = Sampling.weightedSample(
      Seq((1L, 5L), (2L, 0L), (3L, -4L)).toDF("id", "w"), "id", "w", 10)
      .collect().map(_.getLong(0)).toSeq
    assert(withZero == Seq(1L))
  }

  test("weightedSample: keys match the md5 A-Res arithmetic") {
    import spark.implicits._
    val df = Seq((0L, 1L), (3L, 1L)).toDF("id", "w")
    val keys = Sampling.weightedSample(df, "id", "w", 2).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // independently derived: round(ln((md5_48(id)+0.5)/2^48) * 1e6)
    assert(keys(0L) == -208595L && keys(3L) == -77978L)
  }

  test("stratifiedHashSample: exact integer thresholds, absent strata drop") {
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val out = Sampling.stratifiedHashSample(df, "id", "stratum",
      Map("a" -> 0.5)).collect()
    // stratum b absent from rates → fully dropped
    assert(out.forall(_.getString(1) == "a"))
    // every survivor's hv is the md5 32-bit prefix and beats the threshold
    def hv(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xff))
    }
    val thr = (0.5 * 4294967296L).toLong
    val expect = (0L until 400L by 2).filter(i => hv(i) < thr).toSet
    assert(out.map(_.getLong(0)).toSet == expect)
    assert(out.forall(r => r.getLong(2) == hv(r.getLong(0))))
    // ~half of the 200 'a' rows survive at rate 0.5
    assert(out.length > 60 && out.length < 140, out.length.toString)
  }

  test("dsirWeights: target-vocabulary docs outrank off-target; exact integer score") {
    import spark.implicits._
    // target docs speak 'quantum flux'; raw background speaks 'mundane noise'
    val df = ((0L until 20L).map(i => (i, "quantum flux quantum flux theory", true)) ++
      (20L until 40L).map(i => (i, "mundane noise mundane noise chatter", false)) ++
      Seq((40L, "quantum flux theory", false), // off-target doc with target vocab
          (41L, "mundane noise chatter", false)))
      .toDF("doc_id", "text", "tgt")
    val out = Sampling.dsirWeights(df, "text", "doc_id", col("tgt"), 256, 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // the target-sounding doc 40 must outrank its same-length off-target twin 41
    assert(out(40L)._1 > out(41L)._1)
    // rank is a permutation and selected == (rank <= 5)
    assert(out.values.map(_._2).toSeq.sorted == (1L to 42L))
    assert(out.values.forall(v => v._3 == (v._2 <= 5L)))
    // score is an exact function: recompute doc 40's score from the λ table
    val lamCheck = Sampling.dsirWeights(
      df, "text", "doc_id", col("tgt"), 256, 5)
      .filter(col("doc_id") === 40L).collect()(0).getLong(2)
    assert(lamCheck == out(40L)._1) // deterministic across runs
  }

  test("epochShuffle: per-epoch permutations, deterministic, epochs differ") {
    import java.security.MessageDigest
    val docs = graft.io.Tables.documents(spark, sf0001).select("doc_id")
    val n = docs.count()
    val r = Sampling.epochShuffle(docs, "doc_id", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // each epoch: a dense 0..n−1 sequence over every doc exactly once
    for (e <- 0L to 2L) {
      val ep = r.filter(_._1 == e)
      assert(ep.map(_._2).sorted.toSeq == (0L until n))
      assert(ep.map(_._3).distinct.length == n)
    }
    // the order is exactly the md5 rank (naive reference)
    def hex(s: String) = MessageDigest.getInstance("MD5").digest(s.getBytes)
      .map("%02x".format(_)).mkString
    val ids = docs.collect().map(_.getLong(0))
    for (e <- 0L to 2L) {
      val want = ids.sortBy(id => (hex(s"epoch#$e#$id"), id)).toSeq
      val got = r.filter(_._1 == e).sortBy(_._2).map(_._3).toSeq
      assert(got == want, s"epoch $e order mismatch")
    }
    // different epochs produce different orders (the point of the op)
    val o0 = r.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq
    val o1 = r.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(o0 != o1)
    // deterministic across runs
    val again = Sampling.epochShuffle(docs, "doc_id", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  test("tokenBudgetSelect == greedy (score, md5, id) prefix at every budget") {
    import graft.functions.TextFunctions
    import java.security.MessageDigest
    val docs = graft.io.Tables.documents(spark, sf0001)
    // the op's own scoring projection, collected once as the reference
    val scored = docs.select(col("doc_id"),
      round(TextFunctions.qualityScore(col("text")) * 1e6, 0).cast("long")
        .as("score_micro"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def hex(s: String) = MessageDigest.getInstance("MD5").digest(s.getBytes)
      .map("%02x".format(_)).mkString
    def naive(budget: Long): Set[Long] = {
      // boundary = highest score whose score-group cumulative overflows
      val byScore = scored.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(-_._1)
      var cum = 0L
      var bScore = Option.empty[Long]
      var rem = 0L
      for ((sc, tok) <- byScore if bScore.isEmpty) {
        if (cum + tok > budget) { bScore = Some(sc); rem = budget - cum }
        else cum += tok
      }
      bScore match {
        case None => scored.map(_._1).toSet
        case Some(bs) =>
          val above = scored.filter(_._2 > bs).map(_._1)
          // boundary group: (md5, id)-ordered running sum over ALL its
          // docs (excluded ones still advance it) — the op's crun filter
          val bdocs = scored.filter(_._2 == bs)
            .sortBy { case (id, _, _) => (hex(s"budget#$id"), id) }
          val crun = bdocs.map(_._3).scanLeft(0L)(_ + _).tail
          (above ++ bdocs.zip(crun).filter(_._2 <= rem).map(_._1._1)).toSet
      }
    }
    val total = scored.map(_._3).sum
    for (budget <- Seq(0L, 37L, 200L, total - 1, total, total + 100)) {
      val got = Sampling.tokenBudgetSelect(docs, "text", "doc_id", budget)
        .collect().map(_.getLong(0)).toSet
      assert(got == naive(budget), s"budget=$budget")
      val spent = scored.filter(t => got(t._1)).map(_._3).sum
      assert(spent <= budget || budget >= total, s"overspent at $budget")
    }
  }

  test("PPS Poisson: membership is the exact integer threshold compare, " +
      "append-stable, and capped at probability 1") {
    import spark.implicits._
    val docs = (1 to 500).map(i => (i.toLong, (i % 97 + 1).toLong))
      .toDF("id", "w")
    val got = Sampling.ppsPoissonSample(docs, "id", "w", 50L)
    val rows = got.collect()
    // recompute membership independently: hv < floor(n*w*2^32 / sumW)
    val sumW = (1 to 500).map(i => (i % 97 + 1).toLong).sum
    def hv(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pps:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val expect = (1 to 500).flatMap { i =>
      val w = (i % 97 + 1).toLong
      val thr = math.min(4294967296L,
        (BigInt(50) * w * BigInt(4294967296L) / sumW).toLong)
      if (hv(i.toLong) < thr) Some(i.toLong) else None
    }.toSet
    assert(rows.map(_.getLong(0)).toSet == expect)
    // thresholds emitted match the recompute exactly
    rows.foreach { r =>
      val w = r.getLong(1)
      val thr = math.min(4294967296L,
        (BigInt(50) * w * BigInt(4294967296L) / sumW).toLong)
      assert(r.getAs[Long]("thr") == thr, s"id=${r.getLong(0)}")
    }
    // appending rows only ever changes membership through sumW — same
    // ids, same engine, rerun is bit-stable
    val again = Sampling.ppsPoissonSample(docs, "id", "w", 50L)
      .collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getLong(0)).toSet)
  }

  test("PPS Poisson: weight-1 rows need w*n >= sumW/2^32 mass; zero and " +
      "negative weights are excluded; huge targetN keeps everything") {
    import spark.implicits._
    val docs = Seq((1L, 0L), (2L, -5L), (3L, 100L), (4L, 1L))
      .toDF("id", "w")
    val all = Sampling.ppsPoissonSample(docs, "id", "w", 1000000L)
      .collect().map(_.getLong(0)).toSet
    // thr saturates at 2^32 for every positive-weight row
    assert(all == Set(3L, 4L))
  }

  test("PPS Poisson: fractional weight columns are rejected loudly — the " +
      "DECIMAL(38,0) cast would silently zero sub-0.5 weights") {
    import spark.implicits._
    val frac = Seq((1L, 0.3), (2L, 2.0)).toDF("id", "w")
    val ex = intercept[IllegalArgumentException] {
      Sampling.ppsPoissonSample(frac, "id", "w", 10L)
    }
    assert(ex.getMessage.contains("integral weight"))
    // integral dtypes pass: decimal scale-0 as well as LONG
    val dec = Seq((1L, BigDecimal(3)), (2L, BigDecimal(2)))
      .toDF("id", "w").withColumn("w", col("w").cast("decimal(20,0)"))
    Sampling.ppsPoissonSample(dec, "id", "w", 10L).collect()
  }
}
