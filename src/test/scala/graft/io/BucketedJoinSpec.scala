package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Co-located join via bucketing — the 100 TB fact⋈fact strategy: both
  * sides pre-bucketed on the join key means the sort-merge join reads
  * bucket-aligned splits with NO shuffle exchange at query time.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is a static conf — tables land in ./spark-warehouse,
    // which is gitignored and dropped below)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")

    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    // disable auto-broadcast so the join would otherwise shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() > 0)

      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = executed.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n$executed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("term-bucketed tf artifact: df aggregation runs with no exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS tf_b")
    val docs = Seq((0L, "spark shuffle join"), (1L, "spark filter scan scan"),
      (2L, "join join shuffle broadcast")).toDF("doc_id", "text")
    graft.ops.Retrieval.termFrequencies(docs, "text", "doc_id")
      .write.bucketBy(4, "term").sortBy("term").saveAsTable("tf_b")
    try {
      // the per-query df aggregation — groupBy(term) — must be satisfied
      // by the bucket layout: zero ShuffleExchange anywhere in the plan
      val dfreq = spark.table("tf_b").groupBy("term").agg(count(lit(1)).as("df"))
      val executed = dfreq.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = executed.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected exchange-free bucketed agg, got:\n$executed")
      // and the answer matches the recomputed-from-text path exactly
      val fromText = graft.ops.Retrieval
        .termFrequencies(docs, "text", "doc_id")
        .groupBy("term").agg(count(lit(1)).as("df"))
      assert(dfreq.exceptAll(fromText).isEmpty && fromText.exceptAll(dfreq).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS tf_b")
    }
  }
}
