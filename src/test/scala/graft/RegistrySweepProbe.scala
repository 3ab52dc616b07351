package graft

/** Dev tool: run EVERY registry query at sf0.001 and print one line per
  * query — threw?, CartesianProduct / BroadcastNestedLoopJoin counts in
  * the adapted plan, ScalaUDF names in the analyzed plan — to calibrate
  * RegistryPlanSweepSpec's whitelists against reality.
  * `sbt "Test/runMain graft.RegistrySweepProbe [prefix...]"`
  */
object RegistrySweepProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.startsWith))
    names.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sf)
        val udfs = df.queryExecution.analyzed.collect {
          case p => p.expressions.flatMap(_.collect {
            case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
              u.udfName.getOrElse("anon")
          })
        }.flatten.distinct.sorted
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        def n(op: String) = plan.sliding(op.length).count(_ == op)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"SWEEP $name%-28s ok    cart=${n("CartesianProduct")} " +
          f"bnlj=${n("BroadcastNestedLoopJoin")} " +
          s"udf=[${udfs.mkString(",")}] " + f"$secs%.1fs")
      } catch {
        case e: Throwable =>
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"SWEEP $name%-28s THREW ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(160)} " + f"$secs%.1fs")
      }
    }
    spark.stop()
  }
}
