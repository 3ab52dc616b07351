package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("contamination: shingle overlap counts, zero-hit and short docs") {
    import spark.implicits._
    val train = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val test = Seq(
      // shares "the quick brown" and "quick brown fox" with train
      (10L, "the quick brown fox sleeps"),
      (11L, "completely different words here now"), // 0 hits
      (12L, "too short")                            // < 3 tokens → no shingles
    ).toDF("doc_id", "text")
    val out = Curation.contamination(train, test, "text", "doc_id", 3)
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 3L, 2L), (11L, 3L, 0L), (12L, 0L, 0L)))
    assert(out(0).getDouble(3) == 0.666667) // round(2/3, 6)
    assert(out(2).getDouble(3) == 0.0)
  }

  test("contamination plans as equi-joins, no cartesian") {
    import spark.implicits._
    val d = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val plan = Curation.contamination(d, d, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("piiStats counts and piiRedact replaces all occurrences") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at bob1@mail.example.com or alice@ex.org today"),
      (2L, "servers 10.0.0.1 and 192.168.4.255 are up"),
      (3L, "mixed admin@host.io from 10.1.2.3"),
      (4L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val stats = Curation.piiStats(df, "text")
      .select("doc_id", "n_emails", "n_ips").orderBy("doc_id").collect()
    assert(stats.map(r => (r.getInt(1), r.getInt(2))).toSeq ==
      Seq((2, 0), (0, 2), (1, 1), (0, 0)))
    val red = df.orderBy("doc_id")
      .select(Curation.piiRedact(col("text"))).as[String].collect()
    assert(red(0) == "reach me at [EMAIL] or [EMAIL] today")
    assert(red(1) == "servers [IP] and [IP] are up")
    assert(red(2) == "mixed [EMAIL] from [IP]")
    assert(red(3) == "nothing sensitive here")
  }

  test("repetitionStats: templated text scores high, distinct text zero") {
    import spark.implicits._
    val df = Seq(
      (1L, "buy now buy now buy now"),  // 6 toks, 2 distinct; 5 bigrams, 2 distinct
      (2L, "all words are unique here"),
      (3L, "one"),                       // single token → no bigrams
      (4L, "")                           // empty → all zero
    ).toDF("doc_id", "text")
    val out = Curation.repetitionStats(df, "text", "doc_id").orderBy("id").collect()
    assert(out(0).getDouble(2) == 0.666667 && out(0).getDouble(3) == 0.6)
    assert(out(1).getDouble(2) == 0.0 && out(1).getDouble(3) == 0.0)
    assert(out(2).getLong(1) == 1L && out(2).getDouble(3) == 0.0)
    assert(out(3).getLong(1) == 0L && out(3).getDouble(2) == 0.0)
  }

  test("winnowDupPairs catches a copied paragraph whole-doc sketches would dilute") {
    import spark.implicits._
    val para = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (11L, s"unique intro words here $para and some closing remarks"),
      (22L, s"completely different beginning text $para with another ending altogether"),
      (33L, "nothing shared with anyone at all in this one honestly")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowDupPairs(df, "text", "doc_id", 4, 4, 2L)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((11L, 22L)))
    // sub-n-gram documents fingerprint to nothing and never pair
    val tiny = Seq((1L, "too few"), (2L, "too few")).toDF("doc_id", "text")
    assert(Dedup.winnowDupPairs(tiny, "text", "doc_id", 4, 4, 1L).count() == 0)
  }

  test("incrementalDedup labels fresh docs against history, whitespace-normalized") {
    import spark.implicits._
    val history = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha  beta   gamma"),  // dup after whitespace normalization
      (11L, "Delta Epsilon"),        // dup after lowercasing
      (12L, "zeta eta theta")        // new content
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(history, fresh, "text", "doc_id")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
      Seq((10L, true), (11L, true), (12L, false)))
  }

  test("packShards: shards fill to the budget boundary, per-bucket isolation") {
    import spark.implicits._
    // single bucket (partitions=1): offsets 0,900,1800,2700 → shards 0,0,0,1
    val df = Seq((1L, 900L), (2L, 900L), (3L, 900L), (4L, 900L)).toDF("doc_id", "n_tok")
    val out = Sampling.packShards(df, "doc_id", "n_tok", 2000L, 1)
      .orderBy("doc_id").select("start_off", "shard").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (900L, 0L), (1800L, 0L), (2700L, 1L)))
    // many buckets: every doc's offset restarts per bucket, shards stay small
    val big = (1L to 200L).map(i => (i, 100L)).toDF("doc_id", "n_tok")
    val packed = Sampling.packShards(big, "doc_id", "n_tok", 500L, 8)
    val perBucket = packed.groupBy("bucket").agg(min("start_off").as("m")).collect()
    assert(perBucket.forall(_.getLong(1) == 0L))
  }

  test("capPerGroup keeps exactly cap rows per group, deterministically") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i % 4 == 0) "big" else "small")).toDF("doc_id", "g")
    val kept = Sampling.capPerGroup(df, "g", "doc_id", 10)
    val sizes = kept.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 10L, "small" -> 10L))
    // run-stable: a second evaluation keeps the identical id set
    val again = Sampling.capPerGroup(df, "g", "doc_id", 10)
    assert(kept.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
    // cap above group size keeps everything
    assert(Sampling.capPerGroup(df, "g", "doc_id", 1000).count() == 100)
  }

  test("quantizeInt8: max element hits ±127, zero vector safe, dequant error bounded") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(2.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out(0).getSeq[Int](1) == Seq(64, -127, 32))   // round(.5/(1/127))=63.5→64
    assert(out(1).getSeq[Int](1) == Seq(0, 0, 0) && out(1).getAs[Double]("mse") == 0.0)
    assert(out(2).getSeq[Int](1) == Seq(127))
    // reconstruction error ≤ (scale/2)^2 per element
    val scale = 1.0 / 127
    assert(out(0).getAs[Double]("mse") <= scale * scale / 4 + 1e-12)
  }

  test("packShards and capPerGroup windows stay partition-parallel (no global sort)") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, 10L, (i % 3).toString)).toDF("doc_id", "n_tok", "g")
    // a window without PARTITION BY plans an Exchange SinglePartition —
    // the one shape that would serialize a 100 TB corpus through one task
    val packed = Sampling.packShards(df, "doc_id", "n_tok", 100L, 8)
      .queryExecution.executedPlan.toString
    assert(!packed.contains("SinglePartition"), packed)
    val capped = Sampling.capPerGroup(df, "g", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(!capped.contains("SinglePartition"), capped)
  }

  test("approx_count_distinct (HLL) tracks exact distinct within rsd") {
    // the sketch path for corpus-wide cardinalities (vocab size, unique
    // users): mergeable, one pass, fixed memory — vs exact distinct's
    // full shuffle. Assert the advertised relative standard deviation.
    import spark.implicits._
    val df = (1 to 20000).map(i => i * 7919 % 9973).toDF("v")
    val r = df.agg(
        countDistinct(col("v")).as("exact"),
        approx_count_distinct(col("v"), 0.02).as("approx"))
      .collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.06, s"exact=$exact approx=$approx")
  }

  test("approx_percentile tracks exact percentile within its error bound") {
    // the 100 TB path for high-cardinality groups (mergeable GK sketch):
    // with accuracy a, rank error ≤ n/a — assert the spec'd bound holds
    // against the exact interpolated percentile q16 gates.
    import spark.implicits._
    val n = 10000
    val df = (1 to n).map(i => (i % 7).toString -> (i * 37 % 9973)).toDF("g", "v")
    val joined = df.groupBy("g").agg(
        expr("percentile(v, 0.5)").as("exact"),
        expr("approx_percentile(v, 0.5, 100)").as("approx"))
      .collect()
    joined.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getInt(2).toDouble)
      // rank error n/100 ≈ 15 rows/group → value error bounded by the
      // local density; 9973/ (n/7) * 15 ≈ 105 — assert a loose 5% of range
      assert(math.abs(e - a) <= 0.05 * 9973, s"group ${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("unigramSurprisal: rare-vocabulary docs score higher; repeated common text lower") {
    import spark.implicits._
    val df = Seq(
      (1L, "the the the the the the the the"),          // one very common token
      (2L, "the quick brown fox jumps over lazy dogs"), // mixed
      (3L, "xylophone quizzical jabberwocky vex")       // all singletons
    ).toDF("doc_id", "text")
    val r = Curation.unigramSurprisal(df, "text", "doc_id")
      .orderBy("id").collect()
    val s = r.map(_.getAs[Double]("surprisal"))
    assert(s(0) < s(1) && s(1) < s(2), s.toSeq.toString)
    assert(r(0).getAs[Long]("n_tokens") == 8L)
  }

  test("chunkDocs: boundaries, overlap, short docs, empty docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks, size 8 stride 4 -> 2 chunks
      (2L, "a b c"),                          // shorter than size -> 1 chunk
      (3L, "")                                // empty -> no rows
    ).toDF("doc_id", "text")
    val r = Curation.chunkDocs(df, "text", "doc_id", 8, 4)
      .orderBy("id", "chunk_idx").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 0L, 8L), (1L, 1L, 6L), (2L, 0L, 3L)))
    // chunk 1 of doc 1 = tokens 5..10 (overlap of 4 with chunk 0)
    val md5of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1).getAs[String]("chunk_md5") == md5of("t5 t6 t7 t8 t9 t10"))
  }

  test("pmiCollocations: inseparable pair tops the list; global top-k avoids a single-partition sort") {
    import spark.implicits._
    // "zig zag" always adjacent and never apart -> maximal PMI;
    // "the cat"/"the dog" share a promiscuous left token -> lower PMI
    val rows = Seq.fill(6)("zig zag") ++ Seq.fill(10)("the cat sat") ++
      Seq.fill(10)("the dog ran")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val q = Curation.pmiCollocations(df, "text", 5L, 10)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "global top-k must plan as TakeOrderedAndProject, not a full sort")
    val r = q.collect()
    assert(r.head.getAs[String]("bigram") == "zig zag", r.map(_.toSeq).mkString("; "))
    val pmiOf = r.map(x => x.getAs[String]("bigram") -> x.getAs[Double]("pmi")).toMap
    assert(pmiOf("zig zag") > pmiOf("the cat"))
  }

  test("knSurprisal: hand-computed Kneser-Ney probabilities on a tiny corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "san francisco"), (2L, "san francisco"), (3L, "new york")
    ).toDF("doc_id", "text")
    // type table: (san,francisco) c_ab=2; (new,york) c_ab=1; T=2
    // p(francisco|san) = (2-.75)/2 + .75*(1/2)*(1/2) = 0.8125
    // p(york|new)      = (1-.75)/1 + .75*(1/1)*(1/2) = 0.625
    val r = Curation.knSurprisal(df, "text", "doc_id")
      .orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(r.map(_.getAs[Long]("n_bigrams")).toSeq == Seq(1L, 1L, 1L))
    val s = r.map(_.getAs[Double]("kn_surprisal"))
    assert(s(0) == math.rint(-math.log(0.8125) * 1e6) / 1e6, s.toSeq.toString)
    assert(s(1) == s(0))
    assert(s(2) == math.rint(-math.log(0.625) * 1e6) / 1e6, s.toSeq.toString)
  }

  test("knSurprisal: continuation backoff punishes one-context tokens (the KN property)") {
    import spark.implicits._
    // "francisco" appears 6 times but ALWAYS after "san" (1 context);
    // "runs" appears 6 times after 6 DIFFERENT words. Under plain
    // interpolation both unseen-backoffs would look identical (same
    // unigram count); under KN the (x,runs) bigrams carry higher
    // continuation mass, so a doc of one-context boilerplate scores
    // LESS fluent (higher surprisal) on its backoff term. Gate the
    // statistic that drives it: n1p_b(francisco)=1 vs n1p_b(runs)=6.
    val rows = Seq.fill(6)("san francisco") ++
      Seq("cat runs", "dog runs", "horse runs", "fox runs", "mouse runs", "wolf runs")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val pos = df.select(explode(zip_with(
        slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("ta"), b.as("tb")))).as("p"))
      .select(col("p.ta"), col("p.tb"))
    val n1pB = pos.groupBy("ta", "tb").count()
      .groupBy("tb").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n1pB("francisco") == 1L && n1pB("runs") == 6L)
    // and the full scores are finite and positive for every doc
    val out = Curation.knSurprisal(df, "text", "doc_id").collect()
    assert(out.length == 12 &&
      out.forall(r => r.getAs[Double]("kn_surprisal") > 0.0))
  }

  test("knSurprisal is partitioning-independent (fixed-point sums)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def run(parts: Int) =
      Curation.knSurprisal(docs.repartition(parts), "text", "doc_id")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(run(2) == run(17))
  }

  test("ksDrift: hand-computed D, argmax tiebreak, identical samples score 0") {
    import spark.implicits._
    val ref = Seq(1L, 2L, 3L, 4L).toDF("v")
    val cur = Seq(3L, 4L, 5L, 6L).toDF("v")
    // F_ref - F_cur at x=1: 1/4-0; x=2: 2/4-0 = .5 (max, first at x=2);
    // x=3: 3/4-1/4 = .5 (tied, later); x=4: 1-2/4 = .5 (tied)
    val r = Curation.ksDrift(ref, cur, "v").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) ==
      (4L, 4L, 2.0, 0.5))
    val same = Curation.ksDrift(ref, ref, "v").head()
    assert(same.getDouble(3) == 0.0)
    // disjoint supports -> D = 1 exactly
    val far = Seq(100L, 101L).toDF("v")
    assert(Curation.ksDrift(ref, far, "v").head().getDouble(3) == 1.0)
    // unequal sample sizes stay exact: ref {1,1,2} vs cur {2}
    // F_ref(1)=2/3 vs 0 -> D = 2/3
    val r2 = Curation.ksDrift(Seq(1L, 1L, 2L).toDF("v"), Seq(2L).toDF("v"), "v")
      .head()
    assert(r2.getDouble(2) == 1.0 && r2.getDouble(3) == 0.666667)
    // the continuous-statistic case micro-rounding exists for: a
    // [0,1]-range quality score used to truncate to bin 0 on both sides
    // (D ~ 0 — the drift alarm could never fire); disjoint fractional
    // supports must now score D = 1 with ks_at at the caller's scale
    val fr = Seq(0.1, 0.2, 0.3).toDF("v")
    val fc = Seq(0.7, 0.8, 0.9).toDF("v")
    val rf = Curation.ksDrift(fr, fc, "v").head()
    assert(rf.getDouble(2) == 0.3 && rf.getDouble(3) == 1.0)
  }

  test("liftTable: hand-computed capture and lift; no-positives corpus yields NULLs") {
    import spark.implicits._
    // scores place 4 rows in bin 9, 4 in bin 4, 2 in bin 0;
    // positives: 3 of 4 top, 1 of 4 mid, 0 of 2 bottom; base rate 4/10
    val df = (Seq.fill(3)((0.95, 1)) ++ Seq((0.95, 0)) ++
      Seq((0.45, 1)) ++ Seq.fill(3)((0.45, 0)) ++ Seq.fill(2)((0.05, 0)))
      .toDF("score", "label")
    val r = Curation.liftTable(df, "score", "label", 10)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6)))
      .sortBy(-_._1).toSeq
    assert(r == Seq(
      // keep top bin: capture 3/4, lift (3/4)/(4/10) = 1.875
      (9L, 4L, 3L, 4L, 3L, 0.75, 1.875),
      // keep top two: capture 1.0, lift (4/8)/(4/10) = 1.25
      (4L, 4L, 1L, 8L, 4L, 1.0, 1.25),
      // keep all: lift exactly 1 by construction
      (0L, 2L, 0L, 10L, 4L, 1.0, 1.0)), r.toString)
    // all-negative corpus: capture/lift undefined -> NULL, not 0
    val neg = Seq((0.9, 0), (0.1, 0)).toDF("score", "label")
    val rn = Curation.liftTable(neg, "score", "label", 10).collect()
    assert(rn.forall(x => x.isNullAt(5) && x.isNullAt(6)))
  }

  test("zipfFit: an exact 1/r law fits slope -1 with r2 ~ 1; uniform counts flatten to 0") {
    import spark.implicits._
    // c_r = 840/r for r = 1..8 — exactly Zipf with exponent 1
    val counts = (1 to 8).map(r => s"t$r" -> 840 / r)
    val text = counts.flatMap { case (t, c) => Seq.fill(c)(t) }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = Curation.zipfFit(df, "text", 256).head()
    assert(r.getLong(0) == 8L)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-4, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(3) > 0.9999, s"r2 ${r.getDouble(3)}")
    // intercept ~ ln 840
    assert(math.abs(r.getDouble(2) - math.log(840)) < 1e-4)
    // uniform counts: slope exactly 0 (y constant), r2 0 by convention
    val flat = Seq((1L, (1 to 6).map(i => s"u$i u$i u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val f = Curation.zipfFit(flat, "text", 256).head()
    assert(f.getDouble(1) == 0.0 && f.getDouble(3) == 0.0, f.toString)
  }

  test("zipfFit plans the top-N as TakeOrderedAndProject, not a full sort") {
    import spark.implicits._
    val df = Seq((1L, "a b c a b a")).toDF("doc_id", "text")
    val plan = Curation.zipfFit(df, "text", 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("ksDrift is partitioning-independent") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def run(parts: Int) = {
      val d = docs.repartition(parts)
      Curation.ksDrift(d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1), "n_chars")
        .head().toSeq
    }
    assert(run(2) == run(17))
  }

  test("unigramSurprisal is partitioning-independent (fixed-point sums)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def run(parts: Int) =
      Curation.unigramSurprisal(docs.repartition(parts), "text", "doc_id")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(run(2) == run(17))
  }

  test("trainTextClassifier learns a separable corpus; bit-identical across partitionings") {
    import spark.implicits._
    val rows = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, "excellent wonderful prose with careful structure", 1)
      else (i.toLong, "spam spam buy now click here spam", 0)
    }
    val df = rows.toDF("doc_id", "text", "y")
    val wm = Curation.trainTextClassifier(df, "text", "y", dim = 16, iters = 5, lr = 1.0)
    val scores = Curation.scoreTextClassifier(df, "text", "doc_id", wm)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pos = rows.filter(_._3 == 1).map(r => scores(r._1))
    val neg = rows.filter(_._3 == 0).map(r => scores(r._1))
    assert(pos.min > neg.max,
      s"classifier failed to separate: pos min ${pos.min} <= neg max ${neg.max}")
    // exact-integer training discipline → identical weights at any parallelism
    val wm2 = Curation.trainTextClassifier(df.repartition(7), "text", "y",
      dim = 16, iters = 5, lr = 1.0)
    assert(wm.toSeq == wm2.toSeq)
  }

  test("one-vs-rest lockstep training == independent per-class training; argmax separates") {
    import spark.implicits._
    val langs = Map(
      "en" -> "the cat sat on the mat with the dog and the bird",
      "de" -> "der hund und die katze sind nicht mit der maus",
      "es" -> "el gato y el perro que viven por la casa grande")
    val rows = (0 until 30).map { i =>
      val l = Seq("de", "en", "es")(i % 3)
      (i.toLong, s"${langs(l)} extra$i", l)
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val classes = Seq("de", "en", "es")
    val ovr = Curation.trainOneVsRestClassifiers(df, "text", "lang", classes,
      dim = 16, iters = 3, lr = 1.0)
    // lockstep (one corpus pass per iteration for all classes) must be
    // bit-equal to three independent binary runs — classes never interact
    for ((c, wm) <- ovr) {
      val solo = Curation.trainTextClassifier(
        df.withColumn("__y", (col("lang") === c).cast("int")),
        "text", "__y", dim = 16, iters = 3, lr = 1.0)
      assert(wm.toSeq == solo.toSeq, s"lockstep weights diverged for class $c")
    }
    val pred = Curation.predictLangOneVsRest(df, "text", "doc_id", ovr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val acc = rows.count { case (id, _, l) => pred(id) == l }.toDouble / rows.size
    assert(acc > 0.9, s"one-vs-rest langid accuracy $acc")
    // bit-determinism across partitionings
    val ovr2 = Curation.trainOneVsRestClassifiers(df.repartition(7), "text", "lang",
      classes, dim = 16, iters = 3, lr = 1.0)
    assert(ovr.map { case (c, w) => c -> w.toSeq } ==
      ovr2.map { case (c, w) => c -> w.toSeq })
  }

  test("binaryAuc: hand-computed with ties; perfect separation = 1; degenerate = null") {
    import spark.implicits._
    // + at 0.9, 0.8; − at 0.8, 0.1: pairwise wins 3 + one tie (0.5)
    // → 3.5/4 = 0.875 (rank-sum: r2 = 5 + 8 = 13; (13 − 6)/8)
    val df = Seq((0.9, 1), (0.8, 1), (0.8, 0), (0.1, 0)).toDF("score", "label")
    val r = Curation.binaryAuc(df, "score", "label").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.875, s"auc ${r.getDouble(2)}")
    val perfect = Curation.binaryAuc(
      Seq((0.9, 1), (0.8, 1), (0.3, 0)).toDF("score", "label"), "score", "label")
      .collect()(0)
    assert(perfect.getDouble(2) == 1.0)
    val onlyPos = Curation.binaryAuc(
      Seq((0.9, 1), (0.8, 1)).toDF("score", "label"), "score", "label").collect()(0)
    assert(onlyPos.isNullAt(2), "AUC with one class must be null")
    // partitioning-invariant (exact integer rank sums)
    val big = (0 until 200).map(i => ((i % 17) / 17.0, i % 3 min 1)).toDF("score", "label")
    assert(Curation.binaryAuc(big, "score", "label").collect()(0) ==
      Curation.binaryAuc(big.repartition(7), "score", "label").collect()(0))
  }

  test("calibrationBins: clamped bucketing, exact means and rates") {
    import spark.implicits._
    val df = Seq((0.05, 0), (0.08, 0), (0.95, 1), (0.92, 0), (1.0, 1))
      .toDF("score", "label")
    val r = Curation.calibrationBins(df, "score", "label", 10)
      .orderBy("bin").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 9L), "only bins 0 and 9 populated")
    val b0 = r(0); val b9 = r(1)
    assert(b0.getLong(1) == 2L && b0.getLong(2) == 0L)
    assert(b0.getDouble(3) == 0.065 && b0.getDouble(4) == 0.0)
    // 1.0 clamps into bin 9; mean = (0.95 + 0.92 + 1.0)/3 = 0.956667
    assert(b9.getLong(1) == 3L && b9.getLong(2) == 2L)
    assert(b9.getDouble(3) == 0.956667 && b9.getDouble(4) == 0.666667)
  }

  test("predictLangOneVsRest ties break on ascending class precedence") {
    import spark.implicits._
    val df = Seq((1L, "anything")).toDF("doc_id", "text")
    // two identical (all-zero) models → identical 0.5 scores → 'aa' wins
    val models = Seq("aa" -> Array.fill(16)(0L), "bb" -> Array.fill(16)(0L))
    val r = Curation.predictLangOneVsRest(df, "text", "doc_id", models).collect()(0)
    assert(r.getString(1) == "aa" && r.getDouble(2) == 0.5)
  }

  test("tokenDropout: deterministic, order-preserving, identity at 0%") {
    import spark.implicits._
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val r = Curation.tokenDropout(df, "text", "doc_id", 10)
      .collect().map(x => x.getLong(0) -> x).toMap
    // same text, different ids -> different masks (position hash keys on id)
    assert(r(1L).getAs[String]("aug_text") != r(2L).getAs[String]("aug_text"))
    // ~10% dropped, never reordered
    for (id <- Seq(1L, 2L)) {
      val kept = r(id).getAs[Long]("n_kept")
      assert(r(id).getAs[Long]("n_orig") == 200L)
      assert(kept > 160 && kept < 200, s"doc $id kept $kept")
      val toks = r(id).getAs[String]("aug_text").split(" ")
      val idx = toks.map(_.drop(3).toInt)
      assert(idx.sorted.sameElements(idx), "token order must be preserved")
    }
    // run-stability under repartitioning
    val again = Curation.tokenDropout(df.repartition(7), "text", "doc_id", 10)
      .collect().map(x => x.getLong(0) -> x.getAs[String]("aug_text")).toMap
    assert(again(1L) == r(1L).getAs[String]("aug_text"))
    // 0% dropout is the identity
    val id0 = Curation.tokenDropout(df, "text", "doc_id", 0).collect()
    assert(id0.forall(_.getAs[String]("aug_text") == text))
  }

  test("charEntropy: uniform text maxes, single-char text zeroes, exact terms") {
    import spark.implicits._
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd")).toDF("doc_id", "text")
    val r = Curation.charEntropy(df, "text", "doc_id").orderBy("id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r(0) == ((1L, 4L, 0L)))               // one symbol: H = 0
    // two symbols at 1/2 each: 2 * round(0.5*ln2*1e6) = 2*346574
    assert(r(1) == ((2L, 4L, 693148L)))
    // four at 1/4: 4 * round(0.25*ln4*1e6) = 4*346574
    assert(r(2) == ((3L, 4L, 1386296L)))
  }

  test("vocabOverlap: exact set ratios; zero-overlap pairs absent") {
    import spark.implicits._
    val df = Seq(
      ("en", "alpha beta gamma"), ("en", "alpha delta"),
      ("de", "alpha beta zeta"), ("zz", "nothing shared here"))
      .toDF("lang", "text")
    val r = Curation.vocabOverlap(df, "lang", "text").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val de_en = r(("de", "en"))
    // en vocab {alpha,beta,gamma,delta}=4, de {alpha,beta,zeta}=3, inter 2
    assert(de_en.getAs[Long]("v2") == 4L && de_en.getAs[Long]("v1") == 3L)
    assert(de_en.getAs[Long]("inter") == 2L)
    assert(de_en.getAs[Double]("jaccard") == 2.0 / 5.0)
    assert(de_en.getAs[Double]("containment") == 2.0 / 3.0)
    assert(!r.contains(("de", "zz")) && !r.contains(("en", "zz")))
  }

  test("minhashVocabOverlap: identical vocabs estimate 1, disjoint 0, overlap tracks exact") {
    import spark.implicits._
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val extra = (61 to 120).map(i => s"tok$i").mkString(" ")
    val other = (200 to 260).map(i => s"tok$i").mkString(" ")
    val df = Seq(("a", shared), ("b", shared), ("c", shared), ("c", extra),
      ("d", other)).toDF("g", "text")
    val r = Curation.minhashVocabOverlap(df, "g", "text", 32)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(3)).toMap
    assert(r(("a", "b")) == 1.0)            // identical sets: every min matches
    assert(r(("a", "d")) == 0.0)            // disjoint sets: no min can match
    // a⊂c with |a|/|c| = 0.5 true Jaccard: the k=32 estimate must land
    // within the sketch's ±3/sqrt(k) band
    assert(math.abs(r(("a", "c")) - 0.5) < 0.55 && r(("a", "c")) > 0.1, r(("a", "c")))
    // every pair is present, even the disjoint one
    assert(r.size == 6)
  }

  test("tokenKlDrift: identical corpora score zero everywhere") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val r = Curation.tokenKlDrift(d, d, "text", 10).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("contrib_micro") == 0L))
    assert(r.forall(_.getAs[Long]("kl_micro") == 0L))
  }

  test("tokenKlDrift: the over-represented reference token tops the movers") {
    import spark.implicits._
    val ref = Seq((1L, "drift drift drift drift drift common common"),
      (2L, "drift drift drift drift common")).toDF("doc_id", "text")
    val cur = Seq((3L, "common common common stable"),
      (4L, "common stable stable")).toDF("doc_id", "text")
    val rows = Curation.tokenKlDrift(ref, cur, "text", 10).collect()
    // 'drift' is 9/12 of ref mass and absent from cur: largest |contrib|,
    // positive direction (p >> q)
    assert(rows.head.getAs[String]("t") == "drift")
    assert(rows.head.getAs[Long]("contrib_micro") > 0)
    // total KL is the sum of the per-token contributions (order-free LONGs)
    val total = rows.head.getAs[Long]("kl_micro")
    assert(total == rows.map(_.getAs[Long]("contrib_micro")).sum,
      "kl_micro must equal the contribution sum when k covers the vocab")
    // partitioning invariance of the quantized contributions
    val again = Curation.tokenKlDrift(ref.repartition(5), cur.repartition(3),
      "text", 10).collect()
    assert(again.map(r => (r.getString(0), r.getLong(3))).toSeq ==
      rows.map(r => (r.getString(0), r.getLong(3))).toSeq)
  }

  test("boilerplateShingleStats: shared 5-grams flagged, short docs score 0") {
    import spark.implicits._
    val chrome = "subscribe to our newsletter today please"
    val df = Seq(
      (1L, chrome + " unique alpha body one two"),
      (2L, chrome + " other beta content three four"),
      (3L, "completely independent document body with words galore here"),
      (4L, "tiny doc") // < 5 words → 0 shingles
    ).toDF("doc_id", "text")
    val out = Curation.boilerplateShingleStats(df, "text", "doc_id", 5, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // docs 1,2 share exactly the 2 five-grams inside the 6-word chrome
    assert(out(0)._2 == 7 && out(0)._3 == 2 && out(0)._4 == 0.285714, out(0))
    assert(out(1)._3 == 2, out(1))
    assert(out(2)._3 == 0 && out(2)._4 == 0.0, out(2))
    assert(out(3) == ((4L, 0L, 0L, 0.0)), out(3))
  }

  test("gopherFilter: cascade order, integer-exact bounds, token-free restore") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown foxes jumped over a lazy sleeping dog today"), // kept
      (2L, "word"), // too_short (and would also fail low_stopword — cascade order)
      (3L, Seq.fill(30)("aa").mkString(" ") + " the a of"), // mean len < 3.0 → words_too_short
      (4L, "alpha beta gamma delta epsilon zeta"), // 0 stopwords → low_stopword
      (5L, "spark spark spark spark spark the a of"), // top share 625‰ → repetitive
      (6L, ""), // token-free → restored with zeros → too_short
      (7L, Seq.fill(101)("tok").mkString(" ")) // too_long
    ).toDF("doc_id", "text")
    val got = Curation.gopherFilter(df, "text", "doc_id",
        minTokens = 2, maxTokens = 100, meanLenMinX10 = 30, meanLenMaxX10 = 100,
        minStopwords = 2, maxTopPermille = 300)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == Map(1L -> "kept", 2L -> "too_short", 3L -> "words_too_short",
      4L -> "low_stopword", 5L -> "repetitive", 6L -> "too_short", 7L -> "too_long"))
    // boundary exactness: mean length exactly 3.0 passes (10*sum == 30*n)
    val edge = Curation.gopherFilter(
        Seq((1L, "abc def ghi")).toDF("doc_id", "text"),
        "text", "doc_id", 1, 100, 30, 100, 0, 1000)
      .collect()(0)
    assert(edge.getString(5) == "kept" && edge.getLong(2) == 9)
  }

  test("dedupSegments: df>=minDf windows cut everywhere, docs reassembled in order") {
    import spark.implicits._
    // segTokens=2, minDf=2: "a b" appears in docs 1 (twice) and 2 → cut
    // from all three sites including the first; doc 3 is ALL boilerplate
    // → empty clean_text; doc 4 has a short trailing segment; doc 5 empty
    val df = Seq(
      (1L, "a b x y a b"),     // segs: [a b][x y][a b] → keep [x y]
      (2L, "a b p q r"),       // segs: [a b][p q][r]   → keep [p q][r]
      (3L, "a b a b"),         // segs: [a b][a b]      → all cut
      (4L, "u v w"),           // segs: [u v][w]        → all kept
      (5L, "")                 // no tokens → 0 segments
    ).toDF("doc_id", "text")
    val r = Curation.dedupSegments(df.repartition(3), "text", "doc_id", 2, 2)
      .orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r.toSeq == Seq(
      (1L, 3L, 2L, "x y"),
      (2L, 3L, 1L, "p q r"),
      (3L, 2L, 2L, ""),
      (4L, 2L, 0L, "u v w"),
      (5L, 0L, 0L, "")))
  }
}
