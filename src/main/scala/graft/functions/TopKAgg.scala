package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A scored row inside the top-k aggregate: ordered by score DESC, then
  * id ASC (a total order — ties cannot make results partition-dependent).
  */
case class ScoredId(score: Long, id: Long)

/** Bounded top-k as an `Aggregator[IN, BUF, OUT]` (SURVEY §2.6's custom
  * UDAF surface): each group keeps at most `k` rows in its buffer at
  * every point of the aggregation.
  *
  * Why this beats the window formulation (`row_number().over(...) <= k`)
  * at 100 TB: a window rank SORTS every group's full contents after the
  * shuffle — O(n log n) per group, and the whole group must fit the
  * sort. The aggregator's partial buffers are merged map-side first
  * (ObjectHashAggregate partial aggregation), so at most `k` rows per
  * group per PARTITION cross the wire, and no full-group sort ever
  * happens — O(n log k) total, memory O(k).
  *
  * The buffer is a sorted Vector (insert into position, drop the tail) —
  * for the small `k` this operator is for (top-10s, not top-millions) an
  * insert into a k-element vector beats heap bookkeeping.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Vector[ScoredId], Vector[ScoredId]] {
  require(k > 0, s"k must be positive: $k")

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Vector[ScoredId] = Vector.empty

  override def reduce(buf: Vector[ScoredId], a: ScoredId): Vector[ScoredId] =
    if (buf.length == k && !lt(a, buf.last)) buf
    else {
      val i = buf.indexWhere(b => lt(a, b)) match { case -1 => buf.length; case x => x }
      (buf.patch(i, Seq(a), 0)).take(k)
    }

  override def merge(x: Vector[ScoredId], y: Vector[ScoredId]): Vector[ScoredId] =
    y.foldLeft(x)(reduce)

  override def finish(buf: Vector[ScoredId]): Vector[ScoredId] = buf

  override def bufferEncoder: Encoder[Vector[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Vector[ScoredId]] = ExpressionEncoder()
}

object TopKAgg {
  /** Untyped column form: `topK(5)(scoreCol, idCol)` → sorted
    * `array<struct<score,id>>` (the case-class input flattens to two
    * long arguments).
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k))
    (score: Column, id: Column) => fn(score, id)
  }
}
