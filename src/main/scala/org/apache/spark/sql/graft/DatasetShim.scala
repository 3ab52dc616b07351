package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge: building a DataFrame from a CUSTOM
  * logical plan node (graft's as-of join, `graft.plans.AsofJoin`) needs
  * `Dataset.ofRows`, which Spark scopes to its own package — the
  * standard technique for extension libraries that add whole-operator
  * plan nodes (cf. the public Pathling/Sedona/Delta codebases). This is
  * the ONLY file outside the `graft` namespace; nothing else internal
  * is touched.
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The V1 streaming-source bridge: `Source.getBatch` must return a
    * frame tagged `isStreaming = true` (MicroBatchExecution asserts
    * it), and the only constructor is the `private[sql]`
    * `internalCreateDataFrame` — exactly how Spark's own
    * `FileStreamSource`/`KafkaSource` build their batches (the frame
    * wraps the already-planned RDD of the feed query, so the batch
    * executes the same plan the batch-mode read would).
    */
  def ofBatchAsStream(spark: SparkSession, df: DataFrame): DataFrame =
    rewrapped(spark, df, isStreaming = true)

  /** The V1 streaming-SINK bridge, the mirror image: the frame handed
    * to `Sink.addBatch` is tagged streaming, and every batch writer
    * (`df.write…`) refuses streaming frames — rewrap the planned batch
    * RDD as an ordinary batch frame (one execution, when the write
    * runs), the same move Delta's V1 sink makes.
    */
  def ofStreamBatch(spark: SparkSession, df: DataFrame): DataFrame =
    rewrapped(spark, df, isStreaming = false)

  private def rewrapped(spark: SparkSession, df: DataFrame,
      isStreaming: Boolean): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.toRdd,
      df.schema, isStreaming)
  }
}
