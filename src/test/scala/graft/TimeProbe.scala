package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop WARM-TIMING probe for registry queries (the bench runs
  * min-of-3 on a warm session; single-query Verify runs cold and
  * includes template builds — this measures what the bench measures):
  * `sbt "Test/runMain graft.TimeProbe <sfDir> <queryName...>"`.
  */
object TimeProbe {

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    args.drop(1).foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(s, dir).collect().length
        println(f"[probe] $name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
      }
    }
    s.stop()
  }
}
