package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial cut-outs — Spark-first re-expression of scida's spatial
  * mixin (reference: src/scida/interfaces/mixins/spatial.py:1
  * `SpatialCartesian3DMixin`): axis-aligned box and spherical
  * selections over numeric coordinate columns.
  *
  * Both are pure predicates, so Catalyst pushes the box bounds to the
  * parquet scan (row-group pruning via min/max stats) — at 100 TB the
  * box cut never reads non-overlapping row groups. The sphere cut
  * composes an (optional) pushable bounding-box pre-filter with the
  * exact radial predicate.
  */
object Spatial {

  /** Axis-aligned box selection: for each (column, lo, hi) keep rows
    * with lo <= col < hi. */
  def boxCut(df: DataFrame, bounds: Seq[(String, Double, Double)]): DataFrame =
    bounds.foldLeft(df) { case (acc, (name, lo, hi)) =>
      acc.filter(col(name) >= lit(lo) && col(name) < lit(hi))
    }

  /** Spherical selection: keep rows with Euclidean distance of the
    * given (coordinate, center) pairs below `radius`. */
  def sphereCut(df: DataFrame, coords: Seq[(Column, Double)], radius: Double): DataFrame = {
    val dist2 = coords.map { case (c, ctr) =>
      val dc = c - lit(ctr); dc * dc
    }.reduce(_ + _)
    df.filter(sqrt(dist2) < lit(radius))
  }

  /** Sphere cut with a pushdown-friendly bounding box pre-filter for
    * plain column coordinates (named columns → row-group pruning). */
  def sphereCutPruned(df: DataFrame, coords: Seq[(String, Double)], radius: Double): DataFrame = {
    val boxed = boxCut(df, coords.map { case (n, c) => (n, c - radius, c + radius + 1e-12) })
    sphereCut(boxed, coords.map { case (n, c) => (col(n), c) }, radius)
  }
}
