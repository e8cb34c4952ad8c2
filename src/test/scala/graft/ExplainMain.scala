package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection aid: print the formatted physical plan (and
  * optionally time) of named SparkEntry queries.
  * args = <sfDir> [--time] name1 name2 ... */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val time = args.contains("--time")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val spark = GraftSession.withDefaults(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      CacheScope.withScope {
        val df = SparkEntry.benchQueries(n)(spark, sfDir)
        df.explain("formatted")
        if (time) {
          for (i <- 1 to 3) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f sec")
          }
        }
      }
    }
    spark.stop()
  }
}
