package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder, UnsafeProjection, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** The custom whole-operator tier (SURVEY §2 "custom operators", level c):
  * a backward as-of join as its own logical plan node, planner strategy,
  * and physical sort-merge operator, installed per session.
  *
  * Why a physical operator when the window formulation
  * ([[graft.ops.AsOfJoin.asofBackward]]) is already shuffle-optimal:
  * the union+window form must pack EVERY left column into a struct and
  * push left+right rows through ONE combined sort; this operator sorts
  * each side independently (letting Catalyst reuse existing orderings or
  * bucketing per side) and streams a single backward pointer through the
  * merged iterators — no struct packing, no union, and the left relation
  * never carries right-side nulls through a sort. Same single-shuffle
  * wide edge, strictly less data movement through the sort buffers.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  /** left columns pass through; payload columns emit nullable with the
    * `asof_` prefix (same exprIds as the right child — resolution is by
    * id, the name is cosmetic).
    */
  override val output: Seq[Attribute] =
    left.output ++ payload.map(a => a.withName(s"asof_${a.name}").withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoin =>
      AsofJoinExec(j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.payload, j.output,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }

  /** Idempotent per-session install (`experimental.extraStrategies` is
    * the public extension point; `GraftExtensions` also injects this for
    * the `spark.sql.extensions` path).
    */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        AsofJoinStrategy +: spark.experimental.extraStrategies
  }
}

/** Sort-merge backward as-of: requires both children clustered on the key
  * and sorted by (key, ts); one pass over the merged iterators per
  * partition with a single carried "latest right row ≤ current left ts"
  * buffer. Inclusive at equal timestamps; null keys/timestamps never
  * match (SQL join semantics).
  */
case class AsofJoinExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], override val output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  /** Orderable-as-long extractor: integral, date and timestamp types all
    * surface as int/long in InternalRow with an order-preserving mapping.
    */
  private def longGetter(dt: DataType): (InternalRow, Int) => Long = dt match {
    case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
    case IntegerType | DateType => (r, i) => r.getInt(i).toLong
    case other => throw new IllegalArgumentException(
      s"asof native exec supports integral/date/timestamp key and ts, got $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0, "unbound asof columns")
    val getLKey = longGetter(leftKey.dataType)
    val getLTs = longGetter(leftTs.dataType)
    val getRKey = longGetter(rightKey.dataType)
    val getRTs = longGetter(rightTs.dataType)
    val payloadAttrs = payload
    val rightOut = right.output
    val leftOut = left.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, leftOut ++ outAttrs.drop(leftOut.length))
      val joiner = new JoinedRow
      val nullPayload = new GenericInternalRow(payloadAttrs.length)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rHas = false
        private var lastMatch: InternalRow = _   // copied payload projection
        private var lastMatchKey = 0L
        private var hasLastMatch = false
        advanceRight()

        private def advanceRight(): Unit = {
          rHas = false
          while (!rHas && rIter.hasNext) {
            val c = rIter.next()
            // rows with null key/ts can never match — skip here so the
            // merge loop below compares primitives only
            if (!c.isNullAt(rKeyIdx) && !c.isNullAt(rTsIdx)) { rRow = c; rHas = true }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTsIdx)) {
            resultProj(joiner(l, nullPayload))
          } else {
            val lk = getLKey(l, lKeyIdx)
            val lt = getLTs(l, lTsIdx)
            var rk = if (rHas) getRKey(rRow, rKeyIdx) else 0L
            var rt = if (rHas) getRTs(rRow, rTsIdx) else 0L
            while (rHas && (rk < lk || (rk == lk && rt <= lt))) {
              if (rk == lk) {
                // copy: the sorter reuses its UnsafeRow buffer
                lastMatch = payloadProj(rRow).copy()
                lastMatchKey = lk
                hasLastMatch = true
              }
              advanceRight()
              if (rHas) { rk = getRKey(rRow, rKeyIdx); rt = getRTs(rRow, rTsIdx) }
            }
            val p = if (hasLastMatch && lastMatchKey == lk) lastMatch else nullPayload
            resultProj(joiner(l, p))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
