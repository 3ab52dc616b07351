package graft

/** Dev tool: print a gated query's executed plan and common operator
  * counts (`sbt "Test/runMain graft.PlanProbe sim12_pq_rerank"`), for
  * calibrating PlanAuditSpec's exact-count assertions against reality
  * instead of guessing lower bounds.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      println(s"===== $name =====")
      Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "Exchange",
        "CartesianProduct", "BroadcastNestedLoopJoin", "Window").foreach { op =>
        println(f"$op%-26s ${plan.sliding(op.length).count(_ == op)}")
      }
      println(plan)
    }
    spark.stop()
  }
}
