package graft

import org.apache.spark.sql.functions._
import graft.model.CatalogDataset
import graft.sources.Tables

/** The ArepoSnapshot-style facade: every method delegates to the
  * plan-audited operator and agrees with the direct relational form.
  */
class CatalogDatasetSpec extends SparkSpec {
  import spark.implicits._

  // particles = lineitems; group = order; subhalo-within-group demo
  // uses (custkey ⊃ orderkey) like the subhalo_offsets query
  private lazy val li = Tables.lineitem(spark, sfDir)
  private lazy val cat = new CatalogDataset(li, "l_orderkey")

  test("groupLengths and groupOffsets") {
    val lens = cat.groupLengths
    assert(lens.agg(sum("len")).head().getLong(0) == li.count())
    val offs = cat.groupOffsets(buckets = 8).orderBy("l_orderkey")
      .select("len", "offset").as[(Long, Long)].collect()
    // offsets are the exclusive prefix sum of lengths in group order
    var run = 0L
    offs.foreach { case (len, off) => assert(off == run); run += len }
  }

  test("nested subhalo offsets through the facade") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
    val nested = new CatalogDataset(joined, "o_custkey", Some("l_orderkey"))
    val offs = nested.subhaloOffsets(buckets = 8)
    // every subhalo's offset = parent group offset + local offset
    val total = offs.agg(sum("slen")).head().getLong(0)
    assert(total == joined.count())
    assert(offs.filter(col("local_offset") === 0).count() ==
      offs.select("o_custkey").distinct().count()) // one leader per group
  }

  test("addGroupQuantity broadcasts, addCatalogIds bins, selectGroups prunes") {
    val o = Tables.orders(spark, sfDir)
    val withQ = cat.addGroupQuantity(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_totalprice")
    assert(withQ.count() == li.count())
    assert(withQ.columns.contains("o_totalprice"))

    val banded = cat.addCatalogIds(col("l_quantity"),
      Seq((0.0, 25.0, "low"), (25.0, 1e9, "high")))
    assert(banded.filter(col("band") === "low").count() ==
      li.filter(col("l_quantity") < 25.0).count())

    val sel = cat.selectGroups(Seq(3L, 17L))
    assert(sel.select("l_orderkey").distinct().as[Long].collect().toSet
      .subsetOf(Set(3L, 17L)))
  }

  test("grouped chain through the facade matches direct GroupedChain") {
    val viaFacade = cat.grouped[Long, Double](col("l_orderkey"),
      col("l_linenumber").cast("long") * 1000 + col("l_quantity").cast("long"),
      col("l_quantity")).half.sum.evaluate.collect().toMap
    val direct = graft.operators.GroupedChain.of[Long, Double](li,
      col("l_orderkey"),
      col("l_linenumber").cast("long") * 1000 + col("l_quantity").cast("long"),
      col("l_quantity")).half.sum.evaluate.collect().toMap
    assert(viaFacade == direct)
  }

  test("subhalo methods require a subhalo key") {
    intercept[IllegalStateException](cat.subhaloLengths)
  }

  test("selectLocalSubhalo picks the n-th subhalo of one group") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
    val nested = new CatalogDataset(joined, "o_custkey", Some("l_orderkey"))
    // pick a customer with >= 2 orders
    val custRow = joined.groupBy("o_custkey").agg(countDistinct("l_orderkey").as("n"))
      .filter(col("n") >= 2).orderBy("o_custkey").head()
    val cust = custRow.getLong(0)
    val orders = joined.filter(col("o_custkey") === cust)
      .select("l_orderkey").distinct().as[Long].collect().sorted
    val sel = nested.selectLocalSubhalo(cust, 1)
    assert(sel.select("l_orderkey").distinct().as[Long].collect().toSeq ==
      Seq(orders(1)))
    intercept[IllegalArgumentException](nested.selectLocalSubhalo(cust, 9999))
  }
}
