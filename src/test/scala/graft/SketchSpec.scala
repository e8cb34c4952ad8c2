package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Accuracy bounds for the approximate sketches versus their exact
  * counterparts on testdata. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("DataSketches HLL (lgK=14) within 2% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val (approx, exact) = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(14))),
      countDistinct(col("l_partkey"))).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.02,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile within 1% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val (approx, exact) = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)"),
      expr("percentile(l_extendedprice, 0.5)")).as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.01, s"approx=$approx exact=$exact")
  }
}
