package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed physical plan of one SparkEntry
  * query at sf0.001 (`sbt "runMain graft.PlanPeek <query>"`) — the
  * iterate-on-`.explain` loop PlanAuditSpec's assertions are distilled
  * from. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.withDefaults(SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println(p)
    spark.stop()
  }
}
