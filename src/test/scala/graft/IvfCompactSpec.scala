package graft

import org.apache.spark.sql.functions._
import graft.ann.{Ann, Ivf}
import graft.sources.Tables

/** Compaction of a delta segment into the cell-partitioned IVF
  * layout (the LSM merge behind ann_delta_search): appending the
  * delta under the EXISTING quantizer plus the O(delta) radius-
  * statistic merge must leave [[Ivf.radiusSearch]]'s pruning lossless
  * over the compacted layout — equal, row for row, to brute force
  * over base ∪ delta. */
class IvfCompactSpec extends SparkSpec {

  private lazy val embs = Tables.embeddings(spark, sfDir)

  test("compacted layout + merged radii: pruned radius search stays lossless") {
    val base = embs.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) =!= 4)
    val delta = embs.filter(col("vec_id") =!= 0 &&
      pmod(col("vec_id"), lit(5)) === 4)
    val (indexed, centers) =
      Ivf.build(base, "vec_id", "embedding", nCells = 8)
    val idx = indexed.cache()
    val radii = Ivf.cellRadii(idx, centers, "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft_compact").toString + "/idx"
    idx.write.mode("overwrite").partitionBy("cell").parquet(path)

    // compact: append the delta under the existing quantizer, merge
    // the radius statistic from the delta alone
    val deltaAssigned = Ivf.compact(delta, centers, "embedding", path)
    val merged = Ivf.cellRadiiMerge(deltaAssigned, centers, "embedding", radii)
    idx.unpersist()

    val compacted = spark.read.parquet(path)
    // row accounting: nothing lost, nothing duplicated
    assert(compacted.count() ==
      embs.filter(col("vec_id") =!= 0).count())

    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val pruned = Ivf.radiusSearch(compacted, centers, merged,
      "vec_id", "embedding", q, minCos = 0.2)
      .collect().map(_.toString).sorted.toSeq
    val brute = Ann.radiusSearch(
      embs.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", typedLit(q), minCos = 0.2)
      .collect().map(_.toString).sorted.toSeq
    assert(brute.nonEmpty)
    assert(pruned == brute,
      "pruning over the compacted layout must stay lossless")

    // the STALE radii (pre-merge) must not be trusted: the merge only
    // ever widens a cell, so merged covers every old radius
    assert(radii.keySet.subsetOf(merged.keySet))
    assert(radii.forall { case (c, r) =>
      r.isNaN || merged(c) >= r - 1e-12 })

    // column contract: a delta NARROWER than the at-rest layout
    // (missing the label metadata column) must fail fast, not fork
    // the parquet schema under the directory
    val narrow = delta.select(col("vec_id"), col("embedding"))
    val e = intercept[IllegalArgumentException] {
      Ivf.compact(narrow, centers, "embedding", path)
    }
    assert(e.getMessage.contains("at-rest layout"))
  }
}
