package graft

import org.apache.spark.sql.functions._
import graft.operators.ExactQuantiles

/** Distributed rank-selection exact quantiles: identical results to
  * the value-buffering percentile() aggregate, constant memory.
  */
class ExactQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("matches percentile() on real data across partitionings") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    // same floor-quantization rule as ExactQuantiles (VectorOps.roundAt),
    // not round(): HALF_UP on binary doubles diverges on decimal ties
    val rq = graft.functions.VectorOps.roundAt(_: org.apache.spark.sql.Column, 4)
    val expect = li
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("ps"))
      .select(rq(element_at(col("ps"), 1)), rq(element_at(col("ps"), 2)),
        rq(element_at(col("ps"), 3)))
      .as[(Double, Double, Double)].head()
    for (parts <- Seq(1, 3, 32)) {
      val got = ExactQuantiles.quantiles(li, "l_extendedprice",
        Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"), partitions = parts)
        .as[(Double, Double, Double)].head()
      assert(got == expect, s"partitions=$parts")
    }
  }

  test("interpolation rule and edges: exact ranks, ties, single value") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    // (n-1)*q = 1.5 → 2 + 0.5*(3-2) = 2.5
    val q = ExactQuantiles.quantiles(df, "v", Seq(0.5), Seq("m"), partitions = 2)
      .as[Double].head()
    assert(q == 2.5)
    // q=0 and q=1 hit the extremes exactly
    val ends = ExactQuantiles.quantiles(df, "v", Seq(0.0, 1.0), Seq("lo", "hi"),
      partitions = 3).as[(Double, Double)].head()
    assert(ends == ((1.0, 4.0)))
    // all-equal values and a single row
    assert(ExactQuantiles.quantiles(Seq(7.0, 7.0, 7.0).toDF("v"), "v",
      Seq(0.5), Seq("m"), partitions = 2).as[Double].head() == 7.0)
    assert(ExactQuantiles.quantiles(Seq(9.25).toDF("v"), "v",
      Seq(0.25), Seq("m"), partitions = 4).as[Double].head() == 9.25)
  }
}
