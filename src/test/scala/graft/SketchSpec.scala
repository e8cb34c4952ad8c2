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

  test("Count-Min estimates are one-sided and within the eps*N bound") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val n = li.count()
    val watch = spark.range(1, 101).toDF("l_partkey")
    val eps = 0.0001
    val est = graft.operators.FrequencySketch
      .estimateCounts(li, "l_partkey", watch, eps = eps)
      .as[(Long, Long)].collect().toMap
    val exact = li.filter(col("l_partkey") < 101)
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    watch.as[Long].collect().foreach { k =>
      val t = exact.getOrElse(k, 0L)
      assert(est(k) >= t, s"CMS must never under-count: key $k est ${est(k)} true $t")
      assert(est(k) <= t + math.ceil(eps * n).toLong * 10,
        s"key $k est ${est(k)} true $t way over the eps*N design point")
    }
    // partition-invariance: the fixed seed makes estimates identical
    // under a different physical layout
    val est2 = graft.operators.FrequencySketch
      .estimateCounts(li.repartition(13), "l_partkey", watch, eps = eps)
      .as[(Long, Long)].collect().toMap
    assert(est == est2)
  }
}
