package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width histogram binning.
  *
  * scida's analysis recipes compute 1D/2D histograms over particle
  * fields with dask (reference: docs + dask `da.histogram` usage);
  * Spark-first this is a computed bin id + hash aggregation: the bin
  * id is codegen'd, partial (map-side) aggregation reduces each
  * partition to one row per occupied bin, and the shuffle carries only
  * (bin, partial-count) — O(bins), not O(rows), regardless of input
  * scale.
  */
object Histograms {

  private def binId(c: Column, width: Double): Column =
    floor(c / lit(width)).cast("long")

  /** 1D fixed-width histogram: (bin, n) sorted by bin. */
  def hist1d(df: DataFrame, c: Column, width: Double): DataFrame =
    df.groupBy(binId(c, width).as("bin"))
      .agg(count(lit(1)).as("n"))
      // O(bins) result: single-task local sort, no range exchange /
      // sampling wave — see graft.queries.QueryDef.sortSmall
      .coalesce(1).sortWithinPartitions("bin")

  /** 2D fixed-width histogram: (bin_x, bin_y, n). */
  def hist2d(df: DataFrame, cx: Column, wx: Double, cy: Column, wy: Double): DataFrame =
    df.groupBy(binId(cx, wx).as("bin_x"), binId(cy, wy).as("bin_y"))
      .agg(count(lit(1)).as("n"))
      .coalesce(1).sortWithinPartitions("bin_x", "bin_y")

  /** Weighted 1D histogram (sum of a weight column per bin). */
  def hist1dWeighted(df: DataFrame, c: Column, width: Double, weight: Column): DataFrame =
    df.groupBy(binId(c, width).as("bin"))
      .agg(count(lit(1)).as("n"), sum(weight).as("wsum"))
      .coalesce(1).sortWithinPartitions("bin")

  /** Weighted 2D histogram — the phase-space diagram (e.g. ρ–T binned
    * with mass weights, the scida-docs staple): per-cell count and
    * weight sum, map-side bin ids, O(cells) shuffle. */
  def hist2dWeighted(df: DataFrame, cx: Column, wx: Double,
      cy: Column, wy: Double, weight: Column): DataFrame =
    df.groupBy(binId(cx, wx).as("bin_x"), binId(cy, wy).as("bin_y"))
      .agg(count(lit(1)).as("n"), sum(weight).as("wsum"))
      .coalesce(1).sortWithinPartitions("bin_x", "bin_y")

  /** N-dimensional fixed-width histogram — the dask `histogramdd`
    * surface behind scida's phase-space recipes (ρ–T–mass 3D binning
    * and up): one codegen'd composite bin id per axis, partial
    * (map-side) aggregation, ONE shuffle carrying O(occupied cells)
    * rows whatever the input size — the exact same plan shape as
    * hist2d, generalized. Columns: bin_0..bin_{d-1}, n[, wsum].
    * Occupied cells only (dask semantics with dense edges differ only
    * by zero rows — join a cell frame if dense output is needed). */
  def histDD(df: DataFrame, dims: Seq[(Column, Double)],
      weight: Option[Column] = None): DataFrame = {
    require(dims.nonEmpty, "histDD needs at least one dimension")
    val bins = dims.zipWithIndex.map { case ((c, w), i) =>
      binId(c, w).as(s"bin_$i")
    }
    val aggs = count(lit(1)).as("n") +:
      weight.map(w => sum(w).as("wsum")).toSeq
    df.groupBy(bins: _*)
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .sortWithinPartitions(dims.indices.map(i => col(s"bin_$i")): _*)
  }

  /** Log-spaced 1D histogram — the astro staple (halo mass functions,
    * luminosity functions bin in log10): bin = floor(log10(x)/decadeW).
    * Non-positive values are excluded (no log), matching numpy/dask
    * behavior with log-spaced edges. */
  def hist1dLog(df: DataFrame, c: Column, decadeWidth: Double): DataFrame =
    df.filter(c > 0)
      .groupBy(floor(log10(c) / lit(decadeWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .coalesce(1).sortWithinPartitions("bin")

  /** Radial profile: mean (and count) of `quantity` in fixed-width
    * radial shells around a center — scida's docs' profile recipe
    * (bin particles by radius, average a field per shell). One
    * map-side bin id + partial aggregation; the shuffle carries
    * (shell, partial sums) only. Radius is the Euclidean distance of
    * the (coordinate, center) pairs. */
  def radialProfile(df: DataFrame, coords: Seq[(Column, Double)],
      quantity: Column, shellWidth: Double): DataFrame = {
    val r = sqrt(coords.map { case (c, ctr) =>
      val d = c - lit(ctr); d * d
    }.reduce(_ + _))
    df.groupBy(floor(r / lit(shellWidth)).cast("long").as("shell"))
      .agg(count(lit(1)).as("n"), sum(quantity).as("qsum"))
      .withColumn("qmean", col("qsum") / col("n"))
      .coalesce(1).sortWithinPartitions("shell")
  }
}
