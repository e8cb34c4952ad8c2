package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Similarity search over an embedding column (SURVEY.md §2 "LLM-
  * data-pipeline: similarity search").
  *
  * Brute force is the exactness baseline: one map-side cosine pass +
  * ORDER BY LIMIT k, which Spark plans as TakeOrderedAndProject —
  * each partition keeps a k-heap and only k rows per partition reach
  * the driver-side merge, no global sort shuffle. The LSH variant is
  * the scale path: deterministic random-hyperplane buckets prune the
  * scan to matching buckets before the exact re-rank.
  */
object Ann {

  /** Exact top-k by cosine against one query vector (a literal array
    * column — effectively broadcast). Cosine rounded to `digits` dp;
    * ties broken by id for full determinism. */
  def bruteForceTopK(embs: DataFrame, id: String, vec: String,
      query: Column, k: Int, digits: Int = 6): DataFrame =
    embs.withColumn("cos", VectorOps.roundAt(VectorOps.cosineFast(col(vec), query), digits))
      .select(col(id), col("cos"))
      .orderBy(col("cos").desc, col(id))
      .limit(k)

  /** Radius (range) similarity search: EVERY vector with cosine ≥
    * `minCos` to the query — the similarity-search complement of
    * top-k (dedup candidate pull, "find all near-copies of this
    * item", recall-oriented retrieval). One map-side codegen'd cosine
    * pass + filter; no shuffle, no sort of the corpus (the caller
    * orders the — typically small — result). At scale the IVF cell
    * layout prunes the scan exactly as for top-k probes. */
  def radiusSearch(embs: DataFrame, id: String, vec: String,
      query: Column, minCos: Double, digits: Int = 6): DataFrame =
    embs.withColumn("cos", VectorOps.roundAt(VectorOps.cosineFast(col(vec), query), digits))
      .filter(col("cos") >= minCos)
      .select(col(id), col("cos"))

  /** Deterministic pseudo-random hyperplane component: a fixed integer
    * hash of (table, plane, dim) mapped to [-1, 1). No session seed —
    * identical buckets on every run and cluster size. */
  private def hpComponent(table: Int, plane: Int, dim: Int): Double = {
    var h = 1125899906842597L // FNV-ish deterministic mix
    for (x <- Seq(table, plane, dim)) { h = h * 31 + x; h ^= (h >>> 17); h *= 0x9E3779B97F4A7C15L }
    ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  /** Bucket id of a vector in one hash table: sign bits of `planes`
    * fixed hyperplane projections. The projection is a zip_with/
    * aggregate dot product against a LITERAL hyperplane array — one
    * codegen'd loop, not dims×planes inlined terms (which would blow
    * janino's 64KB method limit and silently fall back to interpreted
    * evaluation). */
  def lshBucket(vec: Column, dims: Int, table: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val hp = array((0 until dims).map(i => lit(hpComponent(table, p, i))): _*)
      when(VectorOps.dotFast(vec, hp) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: compute each vector's bucket in `tables` hash
    * tables (map-side), keep vectors sharing a bucket with the query
    * in ANY table, exact-rank the survivors. At scale the bucket
    * columns are precomputed/persisted and the probe is a pruned scan
    * — candidates are a small fraction of the corpus. */
  def lshTopK(embs: DataFrame, id: String, vec: String, query: Seq[Double],
      k: Int, dims: Int, tables: Int = 4, planes: Int = 4,
      digits: Int = 6): DataFrame = {
    val qCol = array(query.map(lit): _*)
    def qBucket(t: Int): Long = {
      (0 until planes).map { p =>
        val proj = (0 until dims).map(i => query(i) * hpComponent(t, p, i)).sum
        if (proj >= 0) 1L << p else 0L
      }.sum
    }
    val inAnyBucket = (0 until tables).map { t =>
      lshBucket(col(vec), dims, t, planes) === lit(qBucket(t))
    }.reduce(_ || _)
    bruteForceTopK(embs.filter(inAnyBucket), id, vec, qCol, k, digits)
  }
}
