package graft

import org.apache.spark.sql.functions._
import graft.operators.GroupCatalog

/** Nested group⊃subhalo offsets and ID-list selection — scida
  * semantics (reference: src/scida/customs/arepo/dataset.py:603
  * `get_subhalolengths`, :625 `get_subhalooffsets`,
  * src/scida/customs/arepo/selector.py:100 `select_group`).
  */
class GroupCatalogSpec extends SparkSpec {
  import spark.implicits._

  // Layout with FUZZ: group lengths exceed their subhalo sums (g1 has
  // 3 unbound particles after its subhalos, g3 has 1) — the case where
  // offset(sub) != plain prefix sum of subhalo lengths, and exactly
  // what get_subhalooffsets' goffsets[grnr] + local decomposition
  // handles.
  private lazy val groups =
    Seq((1L, 10L), (2L, 5L), (3L, 4L)).toDF("grp", "glen")
  private lazy val subs = Seq(
    (1L, "a", 3L), (1L, "b", 4L), (2L, "c", 5L), (3L, "d", 1L), (3L, "e", 2L))
    .toDF("grp", "sub", "slen")

  test("subhalo offsets = group offset + local cumulative, fuzz-aware") {
    val out = GroupCatalog.subhaloOffsets(groups, "grp", col("glen"),
      subs, "sub", col("slen"), buckets = 2)
      .select("sub", "local_offset", "offset").as[(String, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // group offsets: g1=0, g2=10 (g1's fuzz counted), g3=15
    assert(out == Map(
      "a" -> ((0L, 0L)), "b" -> ((3L, 3L)),
      "c" -> ((0L, 10L)),
      "d" -> ((0L, 15L)), "e" -> ((1L, 16L))))
  }

  test("per-type offsets: each SubhaloLenType component gets its own layout") {
    // arepo stores each particle TYPE independently: group/subhalo
    // lengths are per-type vectors and each type has its own offset
    // table (get_subhalooffsets(parttype), dataset.py:625). Type 0
    // reproduces the scalar fixture; type 1 has different lengths and
    // different fuzz.
    val groupsT = Seq(
      (1L, Seq(10L, 4L)), (2L, Seq(5L, 3L)), (3L, Seq(4L, 2L)))
      .toDF("grp", "glent")
    val subsT = Seq(
      (1L, "a", Seq(3L, 1L)), (1L, "b", Seq(4L, 2L)),
      (2L, "c", Seq(5L, 3L)), (3L, "d", Seq(1L, 0L)), (3L, "e", Seq(2L, 2L)))
      .toDF("grp", "sub", "slent")
    def run(t: Int) = GroupCatalog.subhaloOffsetsByType(
      groupsT, "grp", col("glent"), subsT, "sub", col("slent"),
      pType = t, buckets = 2)
      .select("sub", "local_offset", "offset").as[(String, Long, Long)]
      .collect().map(x => x._1 -> ((x._2, x._3))).toMap
    // type 0 == the scalar fixture
    assert(run(0) == Map(
      "a" -> ((0L, 0L)), "b" -> ((3L, 3L)),
      "c" -> ((0L, 10L)),
      "d" -> ((0L, 15L)), "e" -> ((1L, 16L))))
    // type 1: group offsets g1=0, g2=4, g3=7; g1 fuzz=1, d empty
    assert(run(1) == Map(
      "a" -> ((0L, 0L)), "b" -> ((1L, 1L)),
      "c" -> ((0L, 4L)),
      "d" -> ((0L, 7L)), "e" -> ((0L, 7L))))
  }

  test("positional (offset,length) slice == membership selection") {
    // particles laid out per the contract: g1 [a a a b b b b fuzz*3]
    // g2 [c*5] g3 [d e e fuzz]
    val layout = Seq("a", "a", "a", "b", "b", "b", "b", "-", "-", "-",
      "c", "c", "c", "c", "c", "d", "e", "e", "-")
    val particles = layout.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("pos", "member")
    val off = GroupCatalog.subhaloOffsets(groups, "grp", col("glen"),
      subs, "sub", col("slen"), buckets = 2)
    for (s <- Seq("a", "b", "c", "d", "e")) {
      val Array((o, n)) = off.filter(col("sub") === s)
        .select("offset", "slen").as[(Long, Long)].collect()
      val positional = particles
        .filter(col("pos") >= o && col("pos") < o + n)
        .select("pos").as[Long].collect().toSet
      val membership = particles.filter(col("member") === s)
        .select("pos").as[Long].collect().toSet
      assert(positional == membership, s"subhalo $s")
      assert(positional.size == n)
    }
  }

  test("selectByIds pushes an In filter to the parquet scan") {
    val sel = GroupCatalog.selectByIds(
      graft.sources.Tables.lineitem(spark, sfDir), "l_orderkey", Seq(3L, 17L))
    val p = sel.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("In(l_orderkey"), p.take(800))
    assert(sel.select("l_orderkey").distinct().as[Long].collect().toSet
      .subsetOf(Set(3L, 17L)))
  }

  test("selectByIdFrame broadcast-semi-joins without shuffling particles") {
    val ids = Seq(3L, 17L).toDF("id")
    val sel = GroupCatalog.selectByIdFrame(
      graft.sources.Tables.lineitem(spark, sfDir), "l_orderkey", ids)
    val p = sel.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(800))
  }

  test("localSubhaloIndex ranks within the group and marks fuzz as -1") {
    // group 1: bound subhalos 10, 12 (local 0, 1); 11 unbound (fuzz)
    // group 2: bound subhalo 20 (local 0)
    val bound = Seq((1L, 10L), (1L, 12L), (2L, 20L)).toDF("grp", "sub")
    val particles = Seq(
      (10L, "a"), (10L, "b"), (11L, "c"), (12L, "d"), (20L, "e"))
      .toDF("sub_key", "pid")
    val got = GroupCatalog.localSubhaloIndex(
      particles, "sub_key", bound, "grp", "sub")
      .select("pid", "local_subhalo_idx")
      .as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 0, "b" -> 0, "c" -> -1, "d" -> 1, "e" -> 0))
  }
}
