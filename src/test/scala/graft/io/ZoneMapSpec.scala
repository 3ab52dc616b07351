package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {

  private def tmp(name: String) =
    s"/tmp/graft_io/spec_zonemap/$name"

  test("readPruned == full-scan filter, and provably scans only hit buckets") {
    import spark.implicits._
    val df = (0L until 1000L).map(k => (k, s"v$k")).toDF("k", "v")
    val path = tmp("basic")
    ZoneMap.writeWithManifest(df, "k", 100L, path)
    val (pruned, nRead, nTotal) = ZoneMap.readPruned(spark, path, "k", 250L, 449L)
    assert(nTotal == 10L && nRead == 3L) // buckets 2, 3, 4
    val got = pruned.select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (250L to 449L).toSeq)
    assert(pruned.inputFiles.forall(f =>
      Seq("zb=2", "zb=3", "zb=4").exists(f.contains)), pruned.inputFiles.toSeq)
  }

  test("sparse keys: stats prune tighter than the bucket arithmetic") {
    import spark.implicits._
    // bucket 0 holds only keys 0-9; a range starting at 50 must skip it
    // even though 50 < 100 (the bucket's arithmetic upper edge)
    val df = ((0L until 10L) ++ (100L until 110L)).map(k => (k, k)).toDF("k", "v")
    val path = tmp("sparse")
    ZoneMap.writeWithManifest(df, "k", 100L, path)
    val (pruned, nRead, nTotal) = ZoneMap.readPruned(spark, path, "k", 50L, 105L)
    assert(nTotal == 2L && nRead == 1L,
      s"min/max stats should skip the 0-9 bucket: read $nRead of $nTotal")
    assert(pruned.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      (100L to 105L).toSeq)
  }

  test("empty hit set returns an empty frame with the data schema") {
    import spark.implicits._
    val df = (0L until 100L).map(k => (k, k)).toDF("k", "v")
    val path = tmp("empty")
    ZoneMap.writeWithManifest(df, "k", 50L, path)
    val (pruned, nRead, _) = ZoneMap.readPruned(spark, path, "k", 5000L, 6000L)
    assert(nRead == 0L && pruned.count() == 0L)
    assert(pruned.columns.contains("k") && pruned.columns.contains("v"))
  }
}
