package graft.ops

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("saltedEquiJoin == plain join on real tables") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf0001).select("o_orderkey", "o_orderpriority")

    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .orderBy("o_orderpriority").collect()
    val salted = SkewJoin.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .orderBy("o_orderpriority").collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting spreads a hot key over saltFactor shuffle keys") {
    import spark.implicits._
    // 10k rows, 90% a single hot key — the classic straggler shape
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 42L, i)).toDF("k", "v")
    val small = Seq((42L, "hot"), (10L, "cold")).toDF("sk", "tag")

    val joined = SkewJoin.saltedEquiJoin(big, small, "k", "sk", 8)
    // per-(key,salt) group sizes: the hot key must occupy >1 salt bucket,
    // and no bucket may hold all of its 9000 rows
    val buckets = big.withColumn("salt",
        pmod(xxhash64(big.columns.map(big(_)).toIndexedSeq: _*), lit(8)))
      .filter(col("k") === 42L).groupBy("salt").count().collect()
    assert(buckets.length == 8, s"hot key used ${buckets.length}/8 salts")
    assert(buckets.map(_.getAs[Long]("count")).max < 9000)
    // and the join is still correct
    assert(joined.filter(col("tag") === "hot").count() == 9000)
    assert(joined.filter(col("tag") === "cold").count() == 1) // k=10 appears once
  }

  test("adaptiveEquiJoin: salted branch fires on a hot key and equals the plain join") {
    import spark.implicits._
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 42L, i)).toDF("k", "v")
    val small = Seq((42L, "hot"), (10L, "cold"), (20L, "x")).toDF("sk", "tag")
    // top1_share = 0.9 ≫ threshold → the salted branch must fire, and the
    // result must still be exactly the plain join's
    val adaptive = SkewJoin.adaptiveEquiJoin(big, small, "k", "sk", 8)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    val plain = big.join(small, col("k") === col("sk")).drop("sk")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(adaptive == plain && adaptive.nonEmpty)
  }

  test("adaptiveEquiJoin: plain branch on a uniform key, same result") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (i.toLong % 1000, i)).toDF("k", "v")
    val small = (0L until 1000L by 7).map(k => (k, s"t$k")).toDF("sk", "tag")
    val adaptive = SkewJoin.adaptiveEquiJoin(big, small, "k", "sk", 8)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    val plain = big.join(small, col("k") === col("sk")).drop("sk")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(adaptive == plain && adaptive.nonEmpty)
  }

  test("adaptiveEquiJoin: row-sampled profile still picks the right branch") {
    import spark.implicits._
    val big = (1 to 20000).map(i => (if (i % 20 == 0) i.toLong else 7L, i)).toDF("k", "v")
    val small = Seq((7L, "hot")).toDF("sk", "tag")
    val adaptive = SkewJoin.adaptiveEquiJoin(big, small, "k", "sk", 8,
      statsEveryNth = 4)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    val plain = big.join(small, col("k") === col("sk")).drop("sk")
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(adaptive == plain && adaptive.nonEmpty)
  }

  test("saltedAgg: exact distinct count per skewed key") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 5 == 0) "hot" else s"k${i % 50}", i % 700)).toDF("key", "v")
    val expected = df.groupBy("key").agg(countDistinct("v").as("nd"))
      .orderBy("key").collect()
    val salted = SkewJoin.saltedAgg(df, "key", 8,
      partial = Seq(collect_set(col("v")).as("vs")),
      merge = Seq(size(array_distinct(flatten(collect_list(col("vs"))))).cast("long").as("nd")))
      .orderBy("key").collect()
    assert(salted.toSeq == expected.toSeq)
  }
}
