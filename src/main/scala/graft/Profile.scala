package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Dev profiler: run named queries (after an sf0.001 warmup) and print a
  * per-JOB breakdown — wall seconds, task count, and the callsite — so an
  * overhead-bound query names the actions that cost, not just stages.
  * Guide §1: empirical loop. stderr/stdout free-form; NOT a driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.VecExpressions.register(spark)
    graft.plans.AsofJoinStrategy.install(spark)
    val names = args.toSeq
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }

    case class J(id: Int, desc: String, t0: Long, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.long")))
          .map(_.linesIterator.filter(l => l.contains("graft") &&
            !l.contains("Profile.scala")).take(2).mkString(" <- "))
          .filter(_.nonEmpty)
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, J(js.jobId, d, js.time)); order.add(js.jobId): Unit
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.t1 = je.time)
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = ()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = ()
    })

    // warm
    qs.foreach { case (n, fn) =>
      try fn(spark, warmDir).count(): Unit catch {
        case NonFatal(e) => System.err.println(s"[profile] warmup $n failed: $e")
      }
    }
    qs.foreach { case (n, fn) =>
      jobs.clear(); order.clear()
      spark.sparkContext.setJobGroup(n, n)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count(): Unit catch {
        case NonFatal(e) => System.err.println(s"[profile] $n failed: $e")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      Thread.sleep(200) // let listener drain
      val js = order.toArray(Array.empty[Integer]).toSeq.distinct
        .flatMap(i => Option(jobs.get(i.intValue())))
      val sum = js.map(j => (j.t1 - j.t0) / 1e3).sum
      println(f"===== $n wall=$wall%.2f s  jobs=${js.size}%d  jobSum=$sum%.2f s =====")
      // aggregate by callsite: count, total seconds
      js.groupBy(_.desc).map { case (d, g) =>
        (d, g.size, g.map(j => (j.t1 - j.t0) / 1e3).sum)
      }.toSeq.sortBy(-_._3).take(30).foreach { case (d, c, t) =>
        println(f"  $t%6.2f s  n=$c%-3d $d%s")
      }
      // top inter-job gaps (driver-side work), attributed to the job that follows
      val sorted = js.sortBy(_.t0)
      val gaps = sorted.sliding(2).collect {
        case Seq(a, b) if b.t0 > a.t1 => ((b.t0 - a.t1) / 1e3, b.desc)
      }.toSeq
      println(f"  -- gapSum=${gaps.map(_._1).sum}%.2f s; top gaps:")
      gaps.sortBy(-_._1).take(12).foreach { case (g, d) =>
        println(f"  gap $g%6.2f s  before $d%s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
