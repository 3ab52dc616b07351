package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sketch]] (CMS + HLL) and [[Multimodal.dhashImage]]. */
class SketchSpec extends SparkSpec {

  private def toks(ts: (String, Int)*) = {
    import spark.implicits._
    ts.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("t")
  }

  test("CMS estimates are exact with no collisions and never underestimate") {
    val df = toks("alpha" -> 100, "beta" -> 7, "gamma" -> 3)
    val sk = Sketch.cmsBuild(df, "t", 4, 512)
    val est = Sketch.cmsEstimate(sk, df.distinct(), "t", 4, 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 tokens in 4x512 buckets: overestimate possible, never under; with
    // this vocabulary the estimates are exact unless all 4 rows collide
    assert(est("alpha") == 100L && est("beta") == 7L && est("gamma") == 3L)
    // total counter mass per row equals the corpus size
    val perRow = sk.groupBy("row_idx").agg(sum("cnt").as("s"))
      .collect().map(_.getLong(1)).toSet
    assert(perRow == Set(110L))
  }

  test("CMS merges by bucket-wise sum (two shards == one corpus)") {
    val a = toks("x" -> 5, "y" -> 2)
    val b = toks("x" -> 3, "z" -> 4)
    val merged = Sketch.cmsBuild(a, "t", 2, 64)
      .unionByName(Sketch.cmsBuild(b, "t", 2, 64))
      .groupBy("row_idx", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketch.cmsBuild(a.unionByName(b), "t", 2, 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("HLL registers: deterministic, mergeable by max, estimate in range") {
    import spark.implicits._
    val vals = (0 until 2000).map(i => s"v$i").toDF("v")
    val regs = Sketch.hllRegisters(vals, "v", 6)
    assert(regs.count() <= 64)
    // merge property: two halves max-merged == whole
    val h1 = Sketch.hllRegisters(vals.filter(expr("substr(v,2) % 2 = 0")), "v", 6)
    val h2 = Sketch.hllRegisters(vals.filter(expr("substr(v,2) % 2 = 1")), "v", 6)
    val merged = h1.unionByName(h2).groupBy("bucket").agg(max("rho").as("rho"))
    assert(merged.exceptAll(regs).isEmpty && regs.exceptAll(merged).isEmpty)
    val est = Sketch.hllEstimate(regs, 6).collect()(0)
    val raw = est.getDouble(est.fieldIndex("est_raw"))
    // 64 registers -> ~13% standard error; accept 3 sigma
    assert(raw > 2000 * 0.6 && raw < 2000 * 1.4, raw)
  }

  test("HLL estimate is partitioning-invariant bit-for-bit") {
    import spark.implicits._
    val vals = (0 until 500).map(i => s"u$i").toDF("v")
    val a = Sketch.hllEstimate(Sketch.hllRegisters(vals, "v", 6), 6).collect()(0)
    val b = Sketch.hllEstimate(Sketch.hllRegisters(vals.repartition(13), "v", 6), 6).collect()(0)
    assert(a == b)
  }

  test("dhashImage: 64 bits, deterministic, identical images collide, distinct differ") {
    import spark.implicits._
    val df = Seq(0L, 1L, 17L, 17L + 63L).toDF("doc_id") // 17 and 80: same w,h mod pattern? (80%9=8 vs 17%9=8, 80%7=3 vs 17%7=3)
    val out = Multimodal.dhashImage(Multimodal.withGeneratedPng(df))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.forall(h => h.length == 64 && h.forall(c => c == '0' || c == '1')))
    // re-run is identical
    val again = Multimodal.dhashImage(Multimodal.withGeneratedPng(df))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == again)
    assert(out(0L) != out(1L)) // different generated content
  }

  test("imageHistogram: bins partition the pixels; mean matches; corrupt row channels") {
    import spark.implicits._
    val df = Seq(3L, 11L).toDF("doc_id")
    val out = Multimodal.imageHistogram(Multimodal.withGeneratedPng(df))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(3L, 11L)) {
      val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
      val grays = for (y <- 0 until h; x <- 0 until w) yield {
        val pix = ((id + 31 * x + 131 * y) % 0x1000000).toInt
        ((pix >> 16) + ((pix >> 8) & 0xff) + (pix & 0xff)) / 3
      }
      val r = out(id)
      assert(r.getLong(1) == w.toLong * h)
      val bins = (0 to 3).map(b => grays.count(_ / 64 == b).toLong)
      assert((2 to 5).map(r.getLong) == bins, s"doc $id bins")
      assert(r.getLong(6) == grays.map(_.toLong).sum / (w * h), s"doc $id mean")
    }
    val bad = Multimodal.imageHistogram(
      Seq((5L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media")).collect()(0)
    assert(bad.getLong(1) == -1L)
  }

  test("keyed HLL: per-key registers estimate each key's cardinality independently") {
    import spark.implicits._
    val df = ((0 until 400).map(i => ("big", s"u$i")) ++
      (0 until 25).map(i => ("small", s"u$i"))).toDF("k", "v")
    val est = Sketch.hllEstimateBy(
        Sketch.hllRegistersBy(df, Seq("k"), "v", 6), Seq("k"), 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // m=64 RAW estimate (no linear-counting branch here): ~13% typical
    // error at scale, biased high below 2.5m — band accordingly, and
    // require clear separation between the keys
    assert(est("big") > 250 && est("big") < 700, est("big"))
    assert(est("small") > 8 && est("small") < 120, est("small"))
    assert(est("big") > est("small") * 3)
    // unkeyed form == keyed form with no keys
    val a = Sketch.hllRegisters(df.select("v"), "v", 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sketch.hllRegistersBy(df.select("v"), Nil, "v", 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("HLL wide-b sparse registers don't overflow (b=8..12, 1-3 values)") {
    import spark.implicits._
    // regression: at b >= 7 the absent-bucket mass (m - n)·2^57 exceeds
    // 2^63 when registers are sparse — a LONG harmonic sum wraps negative
    // silently; the decimal(38,0) accumulation must keep every estimate
    // positive and near the tiny true cardinality across the full b range
    for (b <- Seq(8, 10, 12)) {
      val est = Sketch.hllEstimate(
        Sketch.hllRegisters(Seq("a", "b", "c").toDF("v"), "v", b), b)
        .collect()(0)
      val raw = est.getAs[Double]("est_raw")
      val lc = est.getAs[Double]("lc_est")
      // the RAW estimator reads ~alpha·m at tiny cardinality (standard
      // small-range bias — lc_est is the branch to use); overflow showed
      // up as a NEGATIVE or astronomically large value, so bound by m
      val m = 1L << b
      assert(raw > 0 && raw < m, s"b=$b est_raw=$raw")
      // linear counting is the branch a caller would pick here; exact-ish
      assert(lc > 1 && lc < 10, s"b=$b lc_est=$lc")
    }
    val keyed = Sketch.hllEstimateBy(
      Sketch.hllRegistersBy(Seq(("k", "x")).toDF("k", "v"), Seq("k"), "v", 10),
      Seq("k"), 10).collect()(0)
    assert(keyed.getAs[Double]("est") > 0, keyed)
  }

  test("hllRegisters merge law: max-merged halves equal the direct sketch bit-for-bit") {
    import spark.implicits._
    val all = (0 until 300).map(i => s"val$i")
    def reg(vs: Seq[String]) = Sketch.hllRegisters(vs.toDF("v"), "v", 6)
    val merged = reg(all.take(150)).unionByName(reg(all.drop(150)))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = reg(all)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == direct)
    // and the estimates derived from them are therefore identical
    val em = Sketch.hllEstimate(reg(all.take(150)).unionByName(reg(all.drop(150)))
      .groupBy("bucket").agg(max(col("rho")).as("rho")), 6).collect()(0)
    val ed = Sketch.hllEstimate(reg(all), 6).collect()(0)
    assert(em.getAs[String]("reg_md5") == ed.getAs[String]("reg_md5"))
    assert(em.getAs[Double]("est_raw") == ed.getAs[Double]("est_raw"))
  }

  test("videoDhash: per-frame hashes match the generation arithmetic") {
    import spark.implicits._
    val df = Seq(3L, 10L).toDF("doc_id")
    val out = Multimodal.videoDhash(Multimodal.withGeneratedGif(df))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    for (id <- Seq(3L, 10L)) {
      val (sw, sh, nf) = ((6 + id % 5).toInt, (6 + id % 3).toInt, (2 + id % 4).toInt)
      assert(out.keys.count(_._1 == id) == nf, s"doc $id frame count")
      for (f <- 0 until nf) {
        val gray = (y: Int, x: Int) =>
          ((id + 31 * (x * sw / 9) + 131 * (y * sh / 8) + 997 * f) % 256).toInt
        val expect = (for (y <- 0 until 8; x <- 0 until 8)
          yield if (gray(y, x + 1) > gray(y, x)) '1' else '0').mkString
        assert(out((id, f)) == expect, s"doc $id frame $f")
      }
    }
    val bad = Multimodal.videoDhash(
      Seq((5L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media")).collect()(0)
    assert(bad.getInt(1) == -1 && bad.isNullAt(2))
  }

  test("dhashImage: unreadable payload yields NULL hash") {
    import spark.implicits._
    val junk = Seq((9L, "not a png".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.dhashImage(junk).collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }

  test("ddBuckets/ddQuantiles: hand case, merge law, relative-error guarantee") {
    import spark.implicits._
    val alpha = 10000L // 1%
    // hand case: 1..100 — p50 targets rank 50 (value 50), p99 rank 99
    val vals = (1 to 100).map(_.toLong)
    val sk = Sketch.ddBuckets(vals.toDF("v"), "v", alpha)
    val est = Sketch.ddQuantiles(sk, Seq(500000L, 990000L), alpha)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(est(500000L)._1 == 100L)
    assert(math.abs(est(500000L)._2 / 50.0 - 1.0) <= 0.0102,
      s"p50 ${est(500000L)._2} off >1% from 50")
    assert(math.abs(est(990000L)._2 / 99.0 - 1.0) <= 0.0102,
      s"p99 ${est(990000L)._2} off >1% from 99")
    // non-positive values are excluded by contract, never bucketed
    val skz = Sketch.ddBuckets(Seq(-5L, 0L, 10L).toDF("v"), "v", alpha)
    assert(skz.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0) == 1L)
    // merge law: sketch(a ∪ b) == bucket-wise sum of the two sketches —
    // the property that lets shards/days build independently
    val a = (1 to 60).map(_.toLong * 7).toDF("v")
    val b = (1 to 40).map(_.toLong * 13).toDF("v")
    val whole = Sketch.ddBuckets(a.unionByName(b), "v", alpha)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = Sketch.ddBuckets(a, "v", alpha)
      .unionByName(Sketch.ddBuckets(b, "v", alpha))
      .groupBy("bucket").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(whole == merged)
    // guarantee sweep on a skewed (power-law-ish) corpus: every decile
    // estimate within alpha of the exact same-rank quantile
    val skew = (1 to 2000).map(i => (i.toLong * i * i)).toDF("v")
    val sorted = (1 to 2000).map(i => i.toLong * i * i).sorted
    val qs = (1 to 9).map(_ * 100000L)
    val got = Sketch.ddQuantiles(Sketch.ddBuckets(skew, "v", alpha), qs, alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    qs.foreach { q =>
      val rank = math.max(1L, (q * 2000L + 999999L) / 1000000L)
      val exact = sorted((rank - 1).toInt).toDouble
      assert(math.abs(got(q) / exact - 1.0) <= 0.0102,
        s"q=$q est=${got(q)} exact=$exact")
    }
  }

  test("ddQuantiles endpoints: q=1.0 lands in the max bucket, tiny q in the min") {
    import spark.implicits._
    val sk = Sketch.ddBuckets((1 to 100).map(_.toLong).toDF("v"), "v", 10000L)
    val maxBucket = sk.agg(org.apache.spark.sql.functions.max("bucket"))
      .head.getLong(0)
    val minBucket = sk.agg(org.apache.spark.sql.functions.min("bucket"))
      .head.getLong(0)
    val got = Sketch.ddQuantiles(sk, Seq(1L, 1000000L), 10000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1000000L) == maxBucket, s"p100 not in max bucket: $got")
    assert(got(1L) == minBucket, s"p~0 not in min bucket: $got")
    // out-of-range quantiles refused loudly
    intercept[IllegalArgumentException] {
      Sketch.ddQuantiles(sk, Seq(0L), 10000L)
    }
    intercept[IllegalArgumentException] {
      Sketch.ddQuantiles(sk, Seq(1000001L), 10000L)
    }
  }

  test("ddBuckets fold under deletion: maintained sketch == rebuilt sketch") {
    import spark.implicits._
    val alpha = 10000L
    val base = (1 to 300).map(_.toLong * 3)
    val dels = base.filter(_ % 9 == 0)
    val ins = (1 to 50).map(_.toLong * 11)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maintained = toMap(
      Sketch.ddBuckets(base.toDF("v"), "v", alpha)
        .unionByName(Sketch.ddBuckets(ins.toDF("v"), "v", alpha))
        .unionByName(Sketch.ddBuckets(dels.toDF("v"), "v", alpha)
          .select(col("bucket"), (-col("n")).as("n")))
        .groupBy("bucket").agg(org.apache.spark.sql.functions.sum("n").as("n"))
        .filter(col("n") =!= 0L))
    val survivors = base.filterNot(dels.toSet) ++ ins
    val rebuilt = toMap(Sketch.ddBuckets(survivors.toDF("v"), "v", alpha))
    assert(maintained == rebuilt)
  }

  test("KMV: small key is stored exactly; large key estimates within 4/sqrt(k)") {
    import spark.implicits._
    val k = 64
    val df = ((1 to 10).map(i => ("small", i)) ++
      (1 to 2000).map(i => ("big", i))).toDF("g", "v")
    val sk = Sketch.kmvSketchBy(df, Seq("g"), "v", k)
    val est = Sketch.kmvEstimateBy(sk, Seq("g"), k).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(est("small") == ((10L, 10L)), est.toString) // < k: sketch IS the set
    val (nSk, bigEst) = est("big")
    assert(nSk == k.toLong)
    assert(math.abs(bigEst - 2000.0) / 2000.0 < 4.0 / math.sqrt(k.toDouble),
      s"big est $bigEst")
  }

  test("KMV: duplicates never re-enter the sketch; estimate is multiplicity-free") {
    import spark.implicits._
    val k = 16
    val once = (1 to 9).map(i => ("g", i)).toDF("g", "v")
    val thrice = (1 to 9).flatMap(i => Seq.fill(3)(("g", i))).toDF("g", "v")
    val a = Sketch.kmvEstimateBy(Sketch.kmvSketchBy(once, Seq("g"), "v", k), Seq("g"), k).collect()
    val b = Sketch.kmvEstimateBy(Sketch.kmvSketchBy(thrice, Seq("g"), "v", k), Seq("g"), k).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.head.getLong(3) == 9L)
  }

  test("KMV merge law: bottom-k of per-key sketches equals the direct global sketch") {
    import spark.implicits._
    val k = 32
    // 600 values spread over 3 keys with overlap (v % 3 and v % 5 slices)
    val rows = (1 to 600).map(v => (s"k${v % 3}", v)) ++
      (1 to 600).filter(_ % 5 == 0).map(v => (s"k${v % 3}x", v))
    val df = rows.toDF("g", "v")
    val merged = Sketch.kmvMerge(Sketch.kmvSketchBy(df, Seq("g"), "v", k), k)
      .select("v", "h", "rn").collect().map(_.toSeq).toSet
    val direct = Sketch.kmvSketchBy(df.select(col("v")), Nil, "v", k)
      .select("v", "h", "rn").collect().map(_.toSeq).toSet
    assert(merged == direct)
  }

  test("AMS F2: counters are linear (half-merge == direct) and the median " +
      "estimate brackets the exact F2 on skewed data") {
    import spark.implicits._
    // skewed frequencies: F2 = 100^2 + 10^2 + ... dominated by the head
    val rows = Seq.fill(100)("hot") ++ Seq.fill(10)("warm") ++
      (0 until 50).map(i => s"cold$i")
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val depth = 9
    val direct = Sketch.amsCounters(df, "v", depth)
    assert(direct.count() == depth)
    // linearity: counters over any disjoint split sum to the direct build
    val h0 = Sketch.amsCounters(df.filter(col("id") % 2 === 0), "v", depth)
      .withColumnRenamed("counter", "c0")
    val h1 = Sketch.amsCounters(df.filter(col("id") % 2 === 1), "v", depth)
      .withColumnRenamed("counter", "c1")
    val merged = h0.join(h1, Seq("row_idx"), "full_outer")
      .select(col("row_idx"),
        (coalesce(col("c0"), lit(0L)) + coalesce(col("c1"), lit(0L)))
          .as("counter"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
    val f2Exact = 100L * 100 + 10L * 10 + 50L
    val est = Sketch.amsF2Estimate(direct, depth).head.getLong(1)
    // median-of-9 keeps the estimate within a small constant of F2
    assert(est > f2Exact / 4 && est < f2Exact * 4, s"est $est vs $f2Exact")
  }

  test("AMS F2: estimate is partitioning-invariant and depth rows are " +
      "exactly the odd-median input") {
    import spark.implicits._
    val df = (0 until 300).map(i => s"v${i % 40}").toDF("v")
    val a = Sketch.amsF2Estimate(Sketch.amsCounters(df, "v", 5), 5).head
    val b = Sketch.amsF2Estimate(
      Sketch.amsCounters(df.repartition(7), "v", 5), 5).head
    assert(a == b)
  }

  test("KMV intersection: exact below k, theta-scaled when full, one row " +
      "even for empty overlap") {
    import spark.implicits._
    val k = 16
    // small sets (both below k): estimate must be EXACTLY the overlap
    val a1 = Sketch.kmvSketchBy((1 to 10).map(_.toString).toDF("v"), Nil, "v", k)
    val b1 = Sketch.kmvSketchBy((6 to 12).map(_.toString).toDF("v"), Nil, "v", k)
    val r1 = Sketch.kmvIntersectEstimate(a1, b1, k).head
    assert(r1.getAs[Long]("theta") == 4294967296L)
    assert(r1.getAs[Long]("n_common") == 5L && r1.getAs[Long]("est") == 5L)
    // disjoint sets: the frame still reports one zero row
    val c = Sketch.kmvSketchBy(Seq("x", "y").toDF("v"), Nil, "v", k)
    val d = Sketch.kmvSketchBy(Seq("z").toDF("v"), Nil, "v", k)
    val r2 = Sketch.kmvIntersectEstimate(c, d, k).collect()
    assert(r2.length == 1 && r2(0).getAs[Long]("est") == 0L)
    // large overlapping sets: sketches full, estimate within 3 sigma
    // (~1/sqrt(k) relative) of the true 600-value overlap
    val big1 = (1 to 1000).map(i => s"u$i").toDF("v")
    val big2 = (401 to 1400).map(i => s"u$i").toDF("v")
    val r3 = Sketch.kmvIntersectEstimate(
      Sketch.kmvSketchBy(big1, Nil, "v", 256),
      Sketch.kmvSketchBy(big2, Nil, "v", 256), 256).head
    assert(r3.getAs[Long]("theta") < 4294967296L)
    val est = r3.getAs[Long]("est")
    assert(est > 300 && est < 1000, s"intersection est $est vs true 600")
  }

  test("ddBucketsBy/ddQuantilesBy: per-key sketches match per-key global " +
      "runs and merge bucket-wise") {
    import spark.implicits._
    val rows = (1 to 500).map(i => ("a", i.toLong)) ++
      (1 to 300).map(i => ("b", (i * 7).toLong))
    val df = rows.toDF("g", "v")
    val alpha = 10000L
    val keyed = Sketch.ddQuantilesBy(
      Sketch.ddBucketsBy(df, Seq("g"), "v", alpha),
      Seq("g"), Seq(500000L, 990000L), alpha).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    // each key's answer equals running the GLOBAL sketch on that slice
    for (g <- Seq("a", "b")) {
      val slice = df.filter(col("g") === g).select("v")
      val glob = Sketch.ddQuantiles(
        Sketch.ddBuckets(slice, "v", alpha), Seq(500000L, 990000L), alpha)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      for (q <- Seq(500000L, 990000L))
        assert(keyed((g, q)) == glob(q), s"key $g q $q")
    }
    // merge law: per-key buckets of two disjoint halves sum to direct
    val h0 = Sketch.ddBucketsBy(df.filter(col("v") % 2 === 0), Seq("g"), "v", alpha)
    val h1 = Sketch.ddBucketsBy(df.filter(col("v") % 2 === 1), Seq("g"), "v", alpha)
    val merged = h0.unionByName(h1).groupBy("g", "bucket")
      .agg(sum("n").as("n"))
    val direct = Sketch.ddBucketsBy(df, Seq("g"), "v", alpha)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("KMV intersection: a keyed sketch is rejected loudly, not " +
      "silently mixed across keys") {
    import spark.implicits._
    val keyed = Sketch.kmvSketchBy(
      Seq(("a", "1"), ("a", "2"), ("b", "1")).toDF("g", "v"),
      Seq("g"), "v", 16)
    val global = Sketch.kmvSketchBy(Seq("1", "2").toDF("v"), Nil, "v", 16)
    intercept[IllegalArgumentException] {
      Sketch.kmvIntersectEstimate(keyed, global, 16)
    }
    intercept[IllegalArgumentException] {
      Sketch.kmvIntersectEstimate(global, global.withColumn("extra", lit(1)), 16)
    }
  }

  test("AMS F2: a median square past LONG range raises in-plan instead " +
      "of nulling the estimate") {
    import spark.implicits._
    // hand-built counters frame: counter 4e9 squares to 1.6e19 > Long.Max
    val counters = Seq((0, 4000000000L), (1, 4000000000L), (2, 4000000000L))
      .toDF("row_idx", "counter")
    val ex = intercept[Exception] {
      Sketch.amsF2Estimate(counters, 3).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("exceeds LONG range")))
    // and a comfortable in-range median still emits exactly
    val ok = Seq((0, -3L), (1, 2L), (2, 10L)).toDF("row_idx", "counter")
    assert(Sketch.amsF2Estimate(ok, 3).head.getLong(1) == 9L)
  }

  test("cmsJoinSizeEstimate: never underestimates, exact when no bucket " +
      "collisions, and collisions only push it up") {
    import spark.implicits._
    val a = Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")
    val b = Seq.fill(4)("x") ++ Seq("y") ++ Seq.fill(5)("w")
    val ca = Sketch.cmsBuild(a.toDF("t"), "t", 4, 512)
    val cb = Sketch.cmsBuild(b.toDF("t"), "t", 4, 512)
    val est = Sketch.cmsJoinSizeEstimate(ca, cb).head().getLong(0)
    val truth = 3 * 4 + 2 * 1 // x and y overlap; z/w contribute nothing
    assert(est >= truth)
    // wide sketch, 4 tokens: no collisions whp at width 512 -> exact
    assert(est == truth, s"est $est vs exact $truth (collision at width 512?)")
    // width 1 forces every token into one bucket: the bound degrades to
    // |A|*|B| but must still sit ABOVE the truth
    val est1 = Sketch.cmsJoinSizeEstimate(
      Sketch.cmsBuild(a.toDF("t"), "t", 4, 2),
      Sketch.cmsBuild(b.toDF("t"), "t", 4, 2)).head().getLong(0)
    assert(est1 >= truth)
  }
}
