package graft.ops

/** Dev-only timing probe for t51's persist change: min-of-3 warm runs
  * at the dir given by SPARK_GRAFT_SF_DIR (not part of the test suite —
  * run via `Test/runMain graft.ops.Bm25BenchProbe`).
  */
object Bm25BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("t51_bm25")(spark, dir).collect()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val times = (1 to 3).map(_ => run())
    println(f"t51 min-of-3 warm: ${times.min}%.3f s (all: ${times.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
