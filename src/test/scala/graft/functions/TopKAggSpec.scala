package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKAggSpec extends SparkSpec {

  test("TopKAgg == window row_number formulation across many partitions") {
    import spark.implicits._
    // deterministic pseudo-random scores incl. ties; 7 partitions force
    // the partial-merge path (map-side buffers merged at the final agg)
    val df = (1L to 500L).map(i => ((i % 13).toString, i * 37 % 97, i))
      .toDF("g", "score", "id")
      .repartition(7)
    val top = TopKAgg.topK(4)
    val viaAgg = df.groupBy("g")
      .agg(top(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("t.score"), col("t.id"))
    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    val viaWindow = df
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .select(col("g"), col("rank"), col("score"), col("id"))
    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("reduce/merge keep the buffer bounded and totally ordered") {
    val agg = new TopKAgg(3)
    val rows = Seq(5L, 1L, 9L, 9L, 2L, 7L).zipWithIndex
      .map { case (s, i) => ScoredId(s, i.toLong) }
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(buf.length == 3)
    assert(buf == Vector(ScoredId(9, 2), ScoredId(9, 3), ScoredId(7, 5)))
    // merge in any split order gives the same result
    val (a, b) = rows.splitAt(2)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged == buf)
    // a group smaller than k keeps everything, sorted
    val small = Seq(ScoredId(1, 1), ScoredId(3, 0)).foldLeft(agg.zero)(agg.reduce)
    assert(small == Vector(ScoredId(3, 0), ScoredId(1, 1)))
  }
}
