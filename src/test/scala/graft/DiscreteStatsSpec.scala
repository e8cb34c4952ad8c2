package graft

import org.apache.spark.sql.functions._
import graft.operators.DiscreteStats

/** Guarded value-histogram statistics — the machinery behind
  * quantile_normalize and group_percentiles. The guard is the point:
  * those operators broadcast/window a value histogram, which is only
  * sound for DISCRETE features; a continuous column must fail fast
  * with an actionable message, not OOM the driver at scale.
  */
class DiscreteStatsSpec extends SparkSpec {
  import spark.implicits._

  test("exclusiveCdf matches the naive strictly-less-than counts") {
    CacheScope.withScope {
      val df = Seq(3, 1, 3, 2, 3, 1).toDF("x")
      val cdf = DiscreteStats.exclusiveCdf(df, col("x"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(cdf == Map(1 -> 0L, 2 -> 2L, 3 -> 3L))
    }
  }

  test("a high-cardinality feature fails fast with the pre-bucket remedy") {
    CacheScope.withScope {
      val cont = spark.range(0, 1000).selectExpr("id * 1.0 AS x")
      val e = intercept[IllegalArgumentException](
        DiscreteStats.exclusiveCdf(cont, col("x"), maxDistinct = 100))
      assert(e.getMessage.contains("1000 distinct values"))
      assert(e.getMessage.contains("Pre-bucket"),
        "error must name the remedy")
      // the grouped form guards the total (group, value) pair count
      val gv = spark.range(0, 1000).selectExpr("id % 2 AS g", "id AS v0")
      val e2 = intercept[IllegalArgumentException](
        DiscreteStats.groupValueCounts(gv, Seq("g"), col("v0"),
          maxDistinct = 100))
      assert(e2.getMessage.contains("histogram"))
      // at-or-under the bound passes
      assert(DiscreteStats.exclusiveCdf(cont, col("x"),
        maxDistinct = 1000).count() == 1000)
      assert(DiscreteStats.groupValueCounts(gv, Seq("g"), col("v0"),
        maxDistinct = 1000).count() == 1000)
    }
  }
}
