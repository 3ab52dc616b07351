package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** The bucketed BANDED-signature artifact ([[Dedup.bandedSignatures]]
  * written `bucketBy(N, band_idx, band_hash)`) — the layout contract
  * behind d10/d13's incremental near-dup: the nightly fresh×history band
  * join must read the history artifact with NO Exchange (the artifact
  * was hash-placed once at write time; only the batch-sized fresh side
  * shuffles to align), and the layout must be invisible in results.
  */
class SigArtifactSpec extends SparkSpec {

  private val table = "graft_spec_sigbands"
  private val (n, k, r) = (3, 12, 3)

  private def corpus: (DataFrame, DataFrame) = {
    val d = graft.io.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val fresh = d.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"))
    (d, fresh)
  }

  /** Every node reachable from `p`, descending through the wrappers a
    * plain `collect` stops at: AQE roots, materialized query stages, and
    * cached-relation scans (the op persists its candidate frame, so the
    * band join lives inside an InMemoryRelation's cached plan).
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec => q +: nodes(q.plan)
    case i: InMemoryTableScanExec => i +: nodes(i.relation.cachedPlan)
    case _ => p +: p.children.flatMap(nodes)
  }

  private def bucketScan(p: SparkPlan): Seq[FileSourceScanExec] =
    nodes(p).collect {
      case f: FileSourceScanExec
        if f.tableIdentifier.exists(_.table == table) => f
    }

  test("band join consumes the bucketed artifact with no Exchange on the history side") {
    val (d, fresh) = corpus
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Dedup.bandedSignatures(
        Dedup.minhashSignatures(d, "text", "doc_id", n, k), k, r)
      .repartition(8, col("band_idx"), col("band_hash"))
      .write.mode("overwrite")
      .bucketBy(8, "band_idx", "band_hash").sortBy("band_idx", "band_hash")
      .saveAsTable(table)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Dedup.incrementalMinhashDupPairs(d, fresh, "text", "doc_id",
        n, k, r, 0.5, historyBands = Some(spark.table(table)))
      val rows = pairs.collect()
      assert(rows.nonEmpty, "planted verbatim fresh docs must match history")

      val executed = pairs.queryExecution.executedPlan
      assert(bucketScan(executed).nonEmpty,
        s"bucketed artifact scan missing from the plan:\n$executed")
      // the band join = the lowest join with the artifact scan on exactly
      // one side; that side must be exchange-free (scan + at most
      // sort/filter — the artifact is consumed in its written placement)
      val bandJoins = nodes(executed).collect { case j: BaseJoinExec => j }
        .filter(j => bucketScan(j.left).nonEmpty ^ bucketScan(j.right).nonEmpty)
        .filter { j =>
          val side = if (bucketScan(j.left).nonEmpty) j.left else j.right
          nodes(side).collect { case jj: BaseJoinExec => jj }.isEmpty
        }
      assert(bandJoins.nonEmpty, s"band join not found in:\n$executed")
      bandJoins.foreach { j =>
        val side = if (bucketScan(j.left).nonEmpty) j.left else j.right
        val ex = nodes(side).collect { case e: ShuffleExchangeExec => e }
        assert(ex.isEmpty,
          s"history side of the band join must be exchange-free, got:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("bucketed-artifact results are identical to the unbucketed path") {
    val (d, fresh) = corpus
    spark.sql(s"DROP TABLE IF EXISTS ${table}_eq")
    Dedup.bandedSignatures(
        Dedup.minhashSignatures(d, "text", "doc_id", n, k), k, r)
      .repartition(8, col("band_idx"), col("band_hash"))
      .write.mode("overwrite")
      .bucketBy(8, "band_idx", "band_hash").sortBy("band_idx", "band_hash")
      .saveAsTable(s"${table}_eq")
    try {
      def norm(df: DataFrame) = df.orderBy("fresh_id", "hist_id")
        .collect().map(_.toSeq).toSeq
      val bucketed = norm(Dedup.incrementalMinhashDupPairs(d, fresh,
        "text", "doc_id", n, k, r, 0.5,
        historyBands = Some(spark.table(s"${table}_eq"))))
      val plain = norm(Dedup.incrementalMinhashDupPairs(d, fresh,
        "text", "doc_id", n, k, r, 0.5))
      assert(bucketed.nonEmpty && bucketed == plain)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${table}_eq")
    }
  }
}
