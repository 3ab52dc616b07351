package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit block release for `localCheckpoint`'d frames.
  *
  * `Dataset.localCheckpoint()` persists the query's INTERNAL RDD
  * directly (not through the SQL CacheManager), so `Dataset.unpersist`
  * is a no-op on the result and the blocks are freed only when the
  * ContextCleaner notices the RDD object is unreachable — GC-timing
  * dependent, which at iterative-algorithm scale (k rounds × an n-row
  * frame each) can exhaust block-manager storage mid-run long before a
  * full GC runs. [[free]] reaches the checkpointed RDD through the
  * frame's `LogicalRDD` leaf and unpersists it deterministically.
  *
  * Only call once no later frame still computes FROM the checkpointed
  * one (a checkpoint truncates lineage, so a successor checkpoint's
  * materialization is the safe point).
  */
object Checkpoints {

  /** Drop the checkpoint blocks behind `df` (non-blocking). No-op for
    * frames that are not a materialized checkpoint/RDD leaf.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
