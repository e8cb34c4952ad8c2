package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** SemDeDup-style semantic pruning (Abbas et al., "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): cluster the corpus with a coarse k-means
  * quantizer and, inside each cluster, keep exactly one representative
  * of every group of semantically-near-duplicate vectors.
  *
  * This is the PRUNING operator the pair-finding `dedup_embcos` stops
  * short of: embcos emits the near-dup pair list; SemDeDup decides
  * which rows survive. The keep rule here is the non-transitive
  * "dominance" form, chosen because it is exactly replayable as one
  * EXISTS in the SQL oracle: a vector is DROPPED when some other
  * vector of the same cell is cosine-similar (>= `minCos`, rounded to
  * 6 dp for engine-stable boundaries) AND ranks before it by
  * (centroid-cosine ASC, id ASC). Among mutual near-duplicates the
  * survivor is therefore the one FARTHEST from the cluster centroid —
  * the SemDeDup paper's diversity-keeping choice (§3: "keep the
  * example with the lowest cosine similarity to the centroid").
  *
  * Scale posture: the cluster assignment is one codegen'd map-side
  * pass (centroids ride as a plan literal); the only shuffle is the
  * cell-keyed self-join, which is O(sum of cell²) — the operator's
  * contract is that the quantizer is sized so cells stay bounded
  * (k grows with n; SemDeDup runs 50k clusters on LAION-440M). No
  * global sort, no driver data, no all-pairs anywhere.
  */
object SemDedup {

  /** Prune from a PERSISTED (id, cell) assignment table (the same
    * signature-persist protocol as `Dedup.embCosPairsFromCells`: the
    * artifact is written once beside the corpus, and both this
    * operator and the verifying oracle read the identical table).
    *
    * @param cells    assignment table carrying columns `id` and
    *                 `cell` (single-nearest; resolved BY NAME)
    * @param embs     corpus with `id` and `vec` columns
    * @param centers  the quantizer (index = cell id, 0-based)
    * @param minCos   semantic-duplicate threshold on rounded cosine
    * @return survivors as (id, cell, cent_cos), one row per kept
    *         vector; `cent_cos` is the rounded centroid cosine the
    *         rank was computed from */
  def pruneFromCells(cells: DataFrame, embs: DataFrame, id: String,
      vec: String, centers: Array[Array[Double]],
      minCos: Double): DataFrame = {
    val centLit = typedLit(centers.map(_.toSeq).toSeq)
    // one map-side pass: vector + cell + rounded centroid cosine.
    // Tracked as a cache because BOTH branches of the dominance
    // self-join read it — without the barrier the cosine pass would
    // re-run per branch (no cross-branch CSE in Catalyst).
    val ranked = graft.CacheScope.track(
      cells.select(col(id).as("__id"), col("cell"))
        .join(embs.select(col(id).as("__id"), col(vec).as("__v")), Seq("__id"))
        .withColumn("cent_cos", VectorOps.roundAt(
          VectorOps.cosineFast(col("__v"), element_at(centLit, col("cell") + 1)), 6)))
    val a = ranked.select(col("cell"), col("__id").as("id_a"),
      col("__v").as("v_a"), col("cent_cos").as("cc_a"))
    val b = ranked.select(col("cell"), col("__id").as("id_b"),
      col("__v").as("v_b"), col("cent_cos").as("cc_b"))
    // dominated = rows with a similar-enough same-cell neighbor that
    // ranks before them; cosine + rank evaluated INSIDE the join's
    // codegen stage, only surviving ids pay the distinct
    // NaN guard: a zero/corrupt vector yields NaN cosines, and BOTH
    // engines order NaN above every number (Spark and DuckDB alike) —
    // so without the explicit isnan() a corrupt vector would count as
    // "similar to everything" and be silently pruned. Undefined
    // similarity must never drop data: NaN pairs are NOT duplicates
    // (the oracle and the driver-side spec oracle agree by the same
    // explicit rule).
    val pairCos = VectorOps.roundAt(
      VectorOps.cosineFast(col("v_a"), col("v_b")), 6)
    val dominated = a.join(b, Seq("cell"))
      .filter(col("cc_a") < col("cc_b") ||
        (col("cc_a") === col("cc_b") && col("id_a") < col("id_b")))
      .filter(!isnan(pairCos) && pairCos >= minCos)
      .select(col("id_b").as("__id")).distinct()
    ranked.join(dominated, Seq("__id"), "left_anti")
      .select(col("__id").as(id), col("cell"), col("cent_cos"))
  }
}
