package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("madOutlierStats: hand case incl. even-count interpolation; robust to the outlier") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 10L)).toDF("g", "v")
    val got = Profile.madOutlierStats(df, "g", "v")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // a: med 3, devs [2,1,0,1,97] -> mad 1; only 100 exceeds 3·1
    //    (a mean/stddev screen flags NOTHING here: mean 22, σ≈43.6)
    assert(got("a") == ((5L, 3.0, 1.0, 1L)), got.toString)
    // b: even count — med (2+3)/2 = 2.5, devs [1.5, .5, .5, 7.5]
    //    -> mad (.5+1.5)/2 = 1.0; only 10 flags
    assert(got("b") == ((4L, 2.5, 1.0, 1L)), got.toString)
  }

  test("profile: exact rows/nulls/distincts per column, one row each") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "a"), (null, "a"), (5L, null))
      .toDF("k", "s")
    val r = Profile.profile(df, Seq("k", "s"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("k") == ((5L, 1L, 4L)), s"k profile: ${r("k")}")
    assert(r("s") == ((5L, 1L, 2L)), s"s profile: ${r("s")}")
  }

  test("keySkewProfile: hand-computed Gini/top-share; nulls split out; uniform keys score 0") {
    import spark.implicits._
    // counts a:4 b:2 c:1 (+1 null row) → ranks asc (c,k): c=1,b=2,a=3
    // rc = 1·1 + 2·2 + 3·4 = 17; G = 2·17/(3·7) − 4/3 = 6/21 = 0.285714
    val df = Seq("a", "a", "a", "a", "b", "b", "c", null)
      .toDF("k")
    val r = Profile.keySkewProfile(df, "k").collect()(0)
    assert(r.getString(0) == "k")
    assert(r.getLong(1) == 7L && r.getLong(2) == 1L && r.getLong(3) == 3L &&
      r.getLong(4) == 4L)
    assert(r.getDouble(5) == 0.571429, s"top1_share ${r.getDouble(5)}")
    assert(r.getDouble(6) == 0.285714, s"gini ${r.getDouble(6)}")
    // perfectly uniform distribution → Gini exactly 0
    val u = Profile.keySkewProfile(Seq("a", "b", "c").toDF("k"), "k").collect()(0)
    assert(u.getDouble(6) == 0.0 && u.getDouble(5) == 0.333333)
  }

  test("approx_count_distinct swap stays within its documented error bound") {
    // the scaladoc'd web-scale alternative: same inputs, HLL++ estimate
    // within a few percent of the exact count on a real column
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val exact = o.agg(countDistinct(col("o_custkey"))).head.getLong(0)
    val approx = o.agg(approx_count_distinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact drifted past 5%")
  }

  test("expectationAudit: every rule counts its own violations once, " +
      "nulls route to not_null only") {
    import spark.implicits._
    import Profile.Expectation._
    val df = Seq(
      (Some(1L), Some("a@x.io"), Some(10.0), Some("OK")),
      (Some(2L), Some("bad"), Some(-3.0), Some("OK")),
      (Some(2L), None, Some(5.0), Some("NOPE")),
      (None, Some("c@y.io"), None, None)
    ).toDF("k", "email", "v", "status")
    val ref = Seq(1L, 2L).toDF("rk")
    val got = Profile.expectationAudit(df, Seq(
        NotNull("email"),
        Unique(Seq("k")),
        InRange("v", "0", "100"),
        InSet("status", Seq("OK")),
        MatchesRegex("email", "^[a-z]+@[a-z]+\\.[a-z]+$"),
        ForeignKey("k", ref, "rk")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(("not_null", "email")) == ((4L, 1L, false)))
    // k: 3 non-null rows over 2 distinct -> 1 surplus duplicate
    assert(got(("unique", "k")) == ((4L, 1L, false)))
    // v: one negative; the null v is NOT an in_range violation
    assert(got(("in_range", "v")) == ((4L, 1L, false)))
    assert(got(("in_set", "status")) == ((4L, 1L, false)))
    // emails: "bad" fails the shape; null passes through
    assert(got(("matches_regex", "email")) == ((4L, 1L, false)))
    // FK: all non-null k values exist in ref
    assert(got(("foreign_key", "k")) == ((4L, 0L, true)))
  }

  test("expectationAudit: clean table passes every check; FK counts " +
      "rows not distinct orphans") {
    import spark.implicits._
    import Profile.Expectation._
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s")
    val ref = Seq(1L).toDF("rk")
    val clean = Profile.expectationAudit(df, Seq(
        NotNull("k"), Unique(Seq("k", "s")), InSet("s", Seq("x", "y", "z"))))
      .collect()
    assert(clean.forall(_.getBoolean(4)))
    // two rows share the orphan value 9 -> 2 row violations
    val dup = Seq((9L, "a"), (9L, "b"), (1L, "c")).toDF("k", "s")
    val fk = Profile.expectationAudit(dup,
        Seq(ForeignKey("k", ref, "rk"))).collect()(0)
    assert(fk.getLong(3) == 2L && !fk.getBoolean(4))
  }
}
