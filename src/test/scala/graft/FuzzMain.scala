package graft

import org.apache.spark.sql.SparkSession

/** Cross-engine fuzz driver (scripts/fuzz3.py): runs the named
  * oracle-gated queries against each adversarial dataset dir the
  * python side generated; the python side replays the oracle SQL in
  * DuckDB and diffs exactly. args = outRoot q1,q2,... dir1 dir2 ... */
object FuzzMain {
  def main(args: Array[String]): Unit = {
    val outRoot = args(0)
    val names = args(1).split(",").toSeq
    val dirs = args.drop(2)
    val spark = GraftSession.withDefaults(
      SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    for (d <- dirs; name <- names) {
      val ds = new java.io.File(d).getName
      CacheScope.withScope {
        try qs(name)(spark, d).coalesce(1).write.mode("overwrite")
          .parquet(s"$outRoot/$ds/$name")
        catch { case e: Throwable =>
          System.err.println(s"[fuzz] $ds/$name failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
