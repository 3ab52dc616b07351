package graft
/** Dev tool: print the physical plan of one SparkEntry query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    args.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
