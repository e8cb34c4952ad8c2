package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility: run one bench query (default sf0.1, warm, best-of-1)
  * under a job listener and print every Spark job/stage with its wall
  * time — the "where do the seconds go" companion to PlanPeek.
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobPeek <query>"` */
object JobPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.withDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (e.time, e.properties.getProperty("spark.job.description", "")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(e.jobId, (e.time, "?"))
        println(f"[job ${e.jobId}%3d] ${(e.time - t0) / 1e3}%7.3f s  ${desc.take(110)}")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val ms = for {a <- s.completionTime; b <- s.submissionTime} yield a - b
        println(f"  [stage ${s.stageId}%3d] ${ms.getOrElse(0L) / 1e3}%7.3f s  ${s.numTasks}%4d tasks  ${s.name.take(90)}")
      }
    })
    def once(name: String): Double = CacheScope.withScope {
      val t0 = System.nanoTime()
      SparkEntry.benchQueries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val name = args(0)
    once(name) // warm: codegen + footer caches
    println(s"=== warm pass of $name ===")
    val t = once(name)
    println(f"total: $t%.3f s")
    spark.stop()
  }
}
