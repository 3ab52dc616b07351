package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val df = SparkEntry.entry(spark)
    df.show(10, false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
