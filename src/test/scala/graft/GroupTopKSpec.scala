package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GroupTopK

/** GroupTopK must equal the naive one-reducer-per-group window on any
  * partitioning, while never exchanging the full input. */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  private val data = (1L to 5000L).map(i =>
    (i, s"g${i % 7}", (i * 2654435761L % 9973).toDouble))

  test("matches the naive window for every partitioning") {
    for (parts <- Seq(1, 3, 16)) {
      val df = data.toDF("id", "g", "v").repartition(parts)
      val fast = GroupTopK.topK(df, Seq("g"), Seq(col("v").desc, col("id")), 4)
        .select("id", "g", "v", "rk").collect().map(_.toSeq).toSet
      val slow = naive(df, 4).select("id", "g", "v", "rk")
        .collect().map(_.toSeq).toSet
      assert(fast == slow, s"parts=$parts")
    }
  }

  test("ties at the k boundary resolve identically to the naive window") {
    // many equal values force the tie-break columns to decide rank
    val df = (1L to 200L).map(i => (i, "only", 1.0)).toDF("id", "g", "v")
    val fast = GroupTopK.topK(df.repartition(8), Seq("g"),
      Seq(col("v").desc, col("id")), 5).select("id", "rk")
      .as[(Long, Int)].collect().sorted
    assert(fast.toSeq == (1L to 5L).map(i => (i, i.toInt)))
  }

  test("graft_topk_rows aggregate matches the naive window across partitionings") {
    for (parts <- Seq(1, 3, 16)) {
      val df = data.toDF("id", "g", "v").repartition(parts)
      val agg = df.groupBy("g")
        .agg(call_function("graft_topk_rows",
          struct((-col("v")).as("nv"), col("id")), lit(4)).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("col.id").as("id"), col("g"), (-col("col.nv")).as("v"),
          (col("pos") + 1).cast("int").as("rk"))
      val naiveSet = naive(df, 4).select("id", "g", "v", "rk")
        .collect().map(_.toSeq).toSet
      assert(agg.collect().map(_.toSeq).toSet == naiveSet, s"parts=$parts")
    }
  }

  test("graft_topk_rows partially aggregates before the exchange") {
    val df = data.toDF("id", "g", "v").repartition(8)
    val plan = df.groupBy("g")
      .agg(call_function("graft_topk_rows",
        struct(col("v"), col("id")), lit(3)).as("top"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial mode below the exchange
    assert(plan.contains("ObjectHashAggregate"), plan)
    val aggIdx = plan.indexOf("ObjectHashAggregate")
    val exIdx = plan.indexOf("Exchange")
    assert(exIdx >= 0 && plan.indexOf("ObjectHashAggregate", exIdx) >= 0,
      s"no partial agg below the exchange:\n$plan")
  }

  test("the only exchange is over survivors, not the input") {
    val df = data.toDF("id", "g", "v").repartition(8)
    val plan = GroupTopK.topK(df, Seq("g"), Seq(col("v").desc, col("id")), 3)
      .queryExecution.executedPlan.toString
    // one exchange from the caller's repartition, one for the survivor
    // window — the local top-k phase between them must add none
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    // local phase is a sort WITHIN partitions (no global sort order)
    assert(plan.contains("Sort") && plan.contains("mapPartitions") ||
      plan.contains("MapPartitions"), plan)
  }
}
