package graft

import org.apache.spark.sql.functions._

/** Dev tool: measure sequential vs batched BPE training wall-clock and
  * driver round-trip (job) counts at a given sf and merge budget —
  * `sbt "Test/runMain graft.BpeBenchProbe /root/testdata/sf0.1 64"`.
  * The numbers quoted in [[graft.ops.Tokenize.bpeMergesBatched]]'s
  * scaladoc come from this probe.
  */
object BpeBenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val merges = if (args.length > 1) args(1).toInt else 64
    val spark = TestSpark.spark
    val d = io.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    d.count() // warm the scan cache / JIT

    def jobs(): Long = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length.toLong
    def timed(label: String)(f: => Seq[Seq[Any]]): Seq[Seq[Any]] = {
      val j0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val dj = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - j0
      println(f"[bpe-probe] $label%-12s merges=${r.length}%3d wall=$dt%7.1f s jobs=$dj%4d")
      r
    }

    val seq = timed("sequential") {
      ops.Tokenize.bpeMerges(d, "text", merges)
        .orderBy("round").collect().map(_.toSeq).toSeq
    }
    val bat = timed("batched") {
      ops.Tokenize.bpeMergesBatched(d, "text", merges)
        .orderBy("round").collect().map(_.toSeq).toSeq
    }
    println(s"[bpe-probe] equal=${seq == bat}")
    spark.stop()
  }
}
