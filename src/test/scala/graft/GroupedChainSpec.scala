package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupedChain

/** Chained grouped operations — scida ChainOps/GroupAwareOperation
  * semantics (reference: src/scida/customs/arepo/dataset.py:789,:826).
  */
class GroupedChainSpec extends SparkSpec {
  import spark.implicits._

  // group 1 ordered values: 10,20,30,40,50 ; group 2: 5,7
  private lazy val rows = Seq(
    (1L, 0L, 10.0), (1L, 1L, 20.0), (1L, 2L, 30.0), (1L, 3L, 40.0), (1L, 4L, 50.0),
    (2L, 0L, 5.0), (2L, 1L, 7.0)).toDS()

  test("half takes every second element in group order, then sum") {
    val out = GroupedChain.of(rows).half.sum.evaluate.collect().toMap
    // g1: 10+30+50, g2: 5 — x[::2] of the ORDERED sequence
    assert(out == Map(1L -> 90.0, 2L -> 5.0))
  }

  test("nmax / idxlist restriction (scida evaluate(nmax=, idxlist=))") {
    val threeGroups = Seq(
      (1L, 0L, 10.0), (2L, 0L, 5.0), (2L, 1L, 7.0), (3L, 0L, 100.0)).toDS()
    // nmax bounds the group ids evaluated (halos are mass-ordered)
    assert(GroupedChain.of(threeGroups).limitGroups(2L).sum.evaluate
      .collect().toMap == Map(1L -> 10.0, 2L -> 12.0))
    // idxlist picks explicit groups
    assert(GroupedChain.of(threeGroups).forGroups(Set(1L, 3L)).sum.evaluate
      .collect().toMap == Map(1L -> 10.0, 3L -> 100.0))
    // restriction composes with chain links
    assert(GroupedChain.of(threeGroups).limitGroups(2L).half.sum.evaluate
      .collect().toMap == Map(1L -> 10.0, 2L -> 5.0))
  }

  test("order determinism survives adversarial input ordering") {
    val shuffled = GroupedChain.of(rows.orderBy(rand(7))).half.sum.evaluate
      .collect().toMap
    assert(shuffled == Map(1L -> 90.0, 2L -> 5.0))
  }

  test("chains compose: filter, map, max") {
    val out = GroupedChain.of(rows)
      .filter(_ > 6.0).map(_ / 10.0).max.evaluate.collect().toMap
    assert(out == Map(1L -> 5.0, 2L -> 0.7))
  }

  test("custom final reduction via evaluateWith") {
    val out = GroupedChain.of(rows).half
      .evaluateWith(it => it.mkString("|")).collect().toMap
    assert(out(1L) == "10.0|30.0|50.0" && out(2L) == "5.0")
  }

  test("cannot chain past a final op; evaluate requires a final op") {
    intercept[IllegalArgumentException](GroupedChain.of(rows).sum.half)
    intercept[IllegalStateException](GroupedChain.of(rows).half.evaluate)
  }

  test("matches the relational equivalent on real data") {
    // value-tie-broken order: duplicate line numbers exist in the
    // synthetic lineitem, and half is only order-invariant when
    // remaining ties carry equal values
    val ord = col("l_linenumber").cast("long") * 1000 + col("l_quantity").cast("long")
    val chain = GroupedChain.of[Long, Double](
      graft.sources.Tables.lineitem(spark, sfDir),
      col("l_orderkey"), ord, col("l_quantity"))
      .half.map(_ * 2.0).sum.evaluate.toDF("k", "v")
    val rel = graft.sources.Tables.lineitem(spark, sfDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey").orderBy(ord)))
      .filter((col("rn") - 1) % 2 === 0)
      .groupBy(col("l_orderkey").as("k"))
      .agg(sum(col("l_quantity") * 2.0).as("v"))
    assert(chain.except(rel).isEmpty && rel.except(chain).isEmpty)
  }
}
