package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

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

  test("approx_count_distinct swap stays within its documented error bound") {
    // the scaladoc'd web-scale alternative: same inputs, HLL++ estimate
    // within a few percent of the exact count on a real column
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val exact = o.agg(countDistinct(col("o_custkey"))).head.getLong(0)
    val approx = o.agg(approx_count_distinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact drifted past 5%")
  }
}
