package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Baskets]] — a-priori pair/triple mining laws on hand-computable data. */
class BasketsSpec extends SparkSpec {

  private def baskets(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("basket", "item")
  }

  // 5 baskets over items A/B/C/D; D is infrequent (1 basket) and must be
  // pruned; every support and lift below is hand-checked.
  private val df = baskets(
    1L -> "A", 1L -> "B", 1L -> "C",
    2L -> "A", 2L -> "B",
    3L -> "A", 3L -> "C",
    4L -> "B", 4L -> "C", 4L -> "D",
    5L -> "A", 5L -> "B", 5L -> "C")

  test("frequentPairs: supports, pruning, and exact integer lift") {
    val out = Baskets.frequentPairs(df, "basket", "item", 2L)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // supports: A=4 B=4 C=4 (D=1 pruned); pairs AB=3 AC=3 BC=3;
    // lift = 3·5·1e6 / 16 = 937500 for every pair
    assert(out == Seq(
      ("A", "B", 3L, 4L, 4L, 937500L),
      ("A", "C", 3L, 4L, 4L, 937500L),
      ("B", "C", 3L, 4L, 4L, 937500L)), out.toString)
  }

  test("frequentPairs: within-basket duplicates count support once") {
    val dup = baskets(1L -> "A", 1L -> "A", 1L -> "B", 2L -> "A", 2L -> "B")
    val out = Baskets.frequentPairs(dup, "basket", "item", 2L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 2L, s"support ${out.head.getLong(2)}")
  }

  test("frequentPairs: support floor drops infrequent pairs, not just items") {
    // A and B each frequent (3 baskets) but co-occur only once
    val d = baskets(1L -> "A", 1L -> "B", 2L -> "A", 3L -> "A",
      4L -> "B", 5L -> "B")
    assert(Baskets.frequentPairs(d, "basket", "item", 2L).count() == 0L)
  }

  test("frequentTriples: only ABC survives; a-priori pruning is lossless") {
    val out = Baskets.frequentTriples(df, "basket", "item", 2L)
      .orderBy("item_a", "item_b", "item_c").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    // ABC in baskets 1 and 5; every other triple needs pruned D or has
    // support 1
    assert(out.toSeq == Seq(("A", "B", "C", 2L)), out.mkString(","))
  }

  test("frequentTriples agrees with a direct 3-way count (monotonicity)") {
    import spark.implicits._
    // random-ish but deterministic baskets over 6 items
    val rows = for (b <- 1L to 40L; i <- 0 until 6
      if (b * 7 + i * 13) % 3 != 0) yield (b, s"I$i")
    val d = rows.toDF("basket", "item")
    val direct = d.as("a").join(d.as("b"),
        $"a.basket" === $"b.basket" && $"a.item" < $"b.item")
      .join(d.as("c"), $"a.basket" === $"c.basket" && $"c.item" > $"b.item")
      .groupBy($"a.item".as("item_a"), $"b.item".as("item_b"), $"c.item".as("item_c"))
      .agg(count(lit(1)).as("support")).filter($"support" >= 5)
      .collect().map(_.toSeq).toSet
    val pruned = Baskets.frequentTriples(d, "basket", "item", 5L)
      .collect().map(_.toSeq).toSet
    assert(pruned == direct)
  }
}
