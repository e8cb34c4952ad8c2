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

  test("HLL union of per-group sketches equals the single-pass sketch") {
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(14))))
      .as[Long].head()
    val unioned = li.groupBy("l_returnflag")
      .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    val exact = li.agg(countDistinct(col("l_partkey"))).as[Long].head()
    // merge must not lose accuracy: same error envelope as direct
    assert(math.abs(unioned - exact).toDouble / exact < 0.02,
      s"unioned=$unioned exact=$exact")
    assert(math.abs(unioned - direct).toDouble / math.max(direct, 1) < 0.02,
      s"unioned=$unioned direct=$direct")
  }

  test("approx_percentile within 1% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val (approx, exact) = li.agg(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)"),
      expr("percentile(l_extendedprice, 0.5)")).as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.01, s"approx=$approx exact=$exact")
  }
}
