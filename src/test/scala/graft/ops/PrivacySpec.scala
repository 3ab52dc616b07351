package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  test("kAnonymityAudit flags exactly the under-k groups") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), // group of 3
      ("b", 1L), ("b", 1L),            // group of 2 — violates k=3
      ("a", 2L)                        // singleton — violates
    ).toDF("seg", "bkt")
    val got = Privacy.kAnonymityAudit(df, Seq("seg", "bkt"), 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(("a", 1L) -> ((3L, false)), ("b", 1L) -> ((2L, true)),
      ("a", 2L) -> ((1L, true))))
  }

  test("lDiversityAudit: homogeneous groups flagged even when k-large") {
    import spark.implicits._
    val df = Seq(
      // group (a): 4 rows but ONE sensitive value — the homogeneity attack
      ("a", "flu"), ("a", "flu"), ("a", "flu"), ("a", "flu"),
      // group (b): 3 rows, 3 distinct values — diverse
      ("b", "flu"), ("b", "cold"), ("b", "ulcer"),
      // group (c): 2 rows, 2 distinct — still under l=3
      ("c", "flu"), ("c", "cold")
    ).toDF("quasi", "diag")
    val got = Privacy.lDiversityAudit(df, Seq("quasi"), "diag", 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map("a" -> ((4L, 1L, true)), "b" -> ((3L, 3L, false)),
      "c" -> ((2L, 2L, true))), got.toString)
  }

  test("dpNoisyCounts: keyed noise replays independently, clamps at zero") {
    import spark.implicits._
    val df = Seq.fill(5)("x").map(Tuple1(_)).toDF("g")
      .unionByName(Seq.fill(100)("y").map(Tuple1(_)).toDF("g"))
    val eps = 0.5
    val got = Privacy.dpNoisyCounts(df, "g", eps, "tag-1")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent plain-Scala replay of the keyed inverse-CDF draw
    def expectNoise(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tag-1|$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u32 = java.lang.Long.parseLong(hex, 16)
      val half = 2147483648.0
      val lnArg = 1.0 - math.abs(u32.toDouble + 0.5 - half) / half
      val sign = if (u32 >= 2147483648L) 1.0 else -1.0
      math.round(sign * (-1.0 / eps) * math.log(lnArg) * 1e6)
    }
    assert(got("x")._1 == 5L && got("y")._1 == 100L)
    assert(got("x")._2 == expectNoise("x"), s"x noise ${got("x")}")
    assert(got("y")._2 == expectNoise("y"), s"y noise ${got("y")}")
    assert(got("x")._3 == math.max(5000000L + expectNoise("x"), 0L))
    // determinism across partitionings and reruns
    val again = Privacy.dpNoisyCounts(df.repartition(7), "g", eps, "tag-1")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == got)
    // a different release tag draws DIFFERENT noise (fresh release)
    val other = Privacy.dpNoisyCounts(df, "g", eps, "tag-2")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(other("x") != got("x")._2 || other("y") != got("y")._2)
  }

  test("tClosenessAudit: hand-computed TVD incl. absent-value terms") {
    import spark.implicits._
    // global: x=6, y=4 over n=10
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),          // 4x, 0y
      ("B", "x"), ("B", "y"), ("B", "y"), ("B", "y"),          // 1x, 3y
      ("C", "x"), ("C", "y")                                   // 1x, 1y
    ).toDF("quasi", "diag")
    val got = Privacy.tClosenessAudit(df, Seq("quasi"), "diag", 0.2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // A: |1−.6| + |0−.4| = .8 → TVD .4 (the y term comes from the dense
    // grid — a sparse join would silently drop it); B: .35; C: .1
    assert(got == Map("A" -> ((4L, 0.4, true)), "B" -> ((4L, 0.35, true)),
      "C" -> ((2L, 0.1, false))), got.toString)
  }

  test("generalizeUntilK: first satisfying level chosen, finer audited, coarser unchosen") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L), ("a", 11L), ("a", 12L),
      ("b", 20L), ("b", 21L), ("b", 29L)
    ).toDF("seg", "v")
    val levels = Seq(
      ("exact", Seq("seg" -> col("seg"), "v" -> col("v"))),       // all singletons
      ("decade", Seq("seg" -> col("seg"),
        "v" -> floor(col("v") / lit(10.0)).cast("long"))),        // groups of 3
      ("seg_only", Seq("seg" -> col("seg"))))                     // groups of 3
    val rows = Privacy.generalizeUntilK(df, levels, 3L)
      .orderBy("level").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(rows == Seq(
      (0L, "exact", 6L, 6L, 1L, false),
      (1L, "decade", 2L, 0L, 3L, true),   // FIRST satisfying level
      (2L, "seg_only", 2L, 0L, 3L, false) // satisfies too, but not first
    ), rows.toString)
    // no level satisfies -> no chosen row, audit still complete
    val none = Privacy.generalizeUntilK(df, levels.take(1), 3L).collect()
    assert(none.length == 1 && !none(0).getBoolean(5))
  }

  test("pseudonymize: joinability and distinct cardinality survive, nulls " +
      "pass through, a salt rotation rewrites every token") {
    import spark.implicits._
    val a = Seq(Some(1L), Some(2L), Some(2L), None).toDF("k")
    val b = Seq(Some(2L), Some(3L)).toDF("k")
    val pa = Privacy.pseudonymize(a, Seq("k"), "s1")
    val pb = Privacy.pseudonymize(b, Seq("k"), "s1")
    // same value -> same token across frames: the raw join and the
    // pseudonymized join see the same cardinality
    assert(pa.join(pb, Seq("k")).count() == a.join(b, Seq("k")).count())
    assert(pa.filter(col("k").isNotNull).distinct().count()
      == a.filter(col("k").isNotNull).distinct().count())
    // null stays null (never a token for "no subject")
    assert(pa.filter(col("k").isNull).count() == 1)
    // tokens default to the full 32 lowercase hex chars (128-bit md5);
    // 16-hex is the explicit opt-in
    assert(pa.filter(col("k").isNotNull)
      .filter(!col("k").rlike("^[0-9a-f]{32}$")).count() == 0)
    val narrow = Privacy.pseudonymize(a, Seq("k"), "s1", hexChars = 16)
    assert(narrow.filter(col("k").isNotNull)
      .filter(!col("k").rlike("^[0-9a-f]{16}$")).count() == 0)
    // the narrow token is the prefix of the wide one (same keyed hash)
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(a, Seq("k"), "s1", hexChars = 8)
    }
    // rotating the salt rewrites the whole mapping (crypto-shredding)
    val rot = Privacy.pseudonymize(a, Seq("k"), "s2")
    assert(pa.filter(col("k").isNotNull)
      .join(rot.filter(col("k").isNotNull), Seq("k")).count() == 0)
  }
}
