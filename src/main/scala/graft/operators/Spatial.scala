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

  /** Z-order (Morton) key over up to three coordinate columns: each
    * coordinate is bucketed to `bits` levels over [lo, hi) and the
    * bucket bits are interleaved. Rows close in space get close keys,
    * so a table REPARTITIONED BY RANGE + SORTED on this key packs
    * each parquet row group into a small spatial cell — and because
    * row-group min/max stats of the ORIGINAL coordinate columns then
    * span small ranges, an ordinary pushed-down box predicate prunes
    * almost every non-overlapping row group at the scan. This is the
    * at-rest layout half of the spatial story (the Delta/Iceberg
    * Z-ORDER technique): boxCut supplies the pushdown, zOrderKey
    * makes the pushdown selective at 100 TB. Pure integer codegen'd
    * arithmetic — no UDF. */
  def zOrderKey(coords: Seq[(Column, Double, Double)], bits: Int = 10): Column = {
    require(coords.nonEmpty && coords.size <= 3, "1-3 coordinate columns")
    require(bits * coords.size <= 60, s"too many total bits: ${bits * coords.size}")
    val n = coords.size
    val cells = (1 << bits) - 1
    val bucketed = coords.map { case (c, lo, hi) =>
      require(hi > lo, "empty coordinate range")
      least(greatest(floor((c - lit(lo)) / lit(hi - lo) * lit(1 << bits)), lit(0)),
        lit(cells)).cast("long")
    }
    // interleave: bit b of coordinate i lands at position b*n + i
    (0 until bits).flatMap { b =>
      bucketed.zipWithIndex.map { case (col0, i) =>
        shiftleft(shiftright(col0, b).bitwiseAND(1), b * n + i)
      }
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Write `df` clustered by the Z-order of `coords`: range-partition
    * on the key (spatially coherent files), sort within partitions
    * (spatially coherent ROW GROUPS inside each file), drop the key.
    * `numFiles` ~ cluster write parallelism; at 100 TB pick it so
    * files land near the row-group/file size targets. */
  def writeZOrdered(df: DataFrame, path: String,
      coords: Seq[(String, Double, Double)], numFiles: Int,
      bits: Int = 10, options: Map[String, String] = Map.empty): Unit = {
    val keyed = df.withColumn("__z",
      zOrderKey(coords.map { case (c, lo, hi) => (col(c), lo, hi) }, bits))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").options(options).parquet(path)
  }

  /** Angular cross-match of two catalogs (the Zones algorithm — Gray,
    * Nieto-Santisteban & Szalay, "The Zones Algorithm for Finding
    * Points-Near-a-Point or Cross-Matching Spatial Datasets", MSR-TR
    * 2006-52): every row gets a declination zone floor(dec/h) with
    * h = radius; the left catalog replicates to its zone and both
    * neighbors (bounded 3× duplication), candidates join on ZONE
    * EQUALITY (one shuffle, no cross product) with a declination
    * band pre-filter, and the exact haversine distance verifies only
    * candidates. Degrees in, degrees out; the distance is rounded to
    * `digits` before thresholding (trig is not IEEE exact-rounded, so
    * cross-engine comparisons threshold the same rounded value —
    * parity protocol). */
  def crossMatch(a: DataFrame, aId: String, aRa: String, aDec: String,
      b: DataFrame, bId: String, bRa: String, bDec: String,
      radiusDeg: Double, digits: Int = 9): DataFrame = {
    val h = radiusDeg
    require(aId != bId, "catalogs must use distinct id column names")
    // canonical internal names so the two catalogs may share column
    // names without ambiguity
    val zl = floor(col(aDec) / lit(h)).cast("long")
    val left = a.select(col(aId), col(aRa).as("__ra_a"), col(aDec).as("__dec_a"),
      explode(array(zl - 1, zl, zl + 1)).as("__zone"))
    val right = b.select(col(bId), col(bRa).as("__ra_b"), col(bDec).as("__dec_b"),
      floor(col(bDec) / lit(h)).cast("long").as("__zone"))
    val d2r = lit(math.Pi / 180.0)
    val da = col("__dec_a") * d2r; val db = col("__dec_b") * d2r
    val dist = lit(2.0) * asin(sqrt(
      pow(sin((db - da) / 2), 2) +
        cos(da) * cos(db) *
          pow(sin((col("__ra_b") * d2r - col("__ra_a") * d2r) / 2), 2))) / d2r
    left.join(right, Seq("__zone"))
      .filter(abs(col("__dec_b") - col("__dec_a")) <= lit(h)) // zone band pre-filter
      .withColumn("dist_deg", graft.functions.VectorOps.roundAt(dist, digits))
      .filter(col("dist_deg") <= lit(radiusDeg))
      .select(col(aId), col(bId), col("dist_deg"))
  }

  /** Periodic rectangular cutout — scida `rectangular_cutout_mask`
    * with pbc=True (reference: src/scida/misc.py:181, wired through
    * mixins/spatial.py:96): per-axis MINIMUM-IMAGE distance under
    * periodic boundary conditions — d = |x − center|, wrapped to
    * |box − d| when d > box/2 — kept when d < width/2 on every axis.
    * A codegen'd per-row predicate (CASE + abs), no join; unlike the
    * plain box cut it cannot prune row groups when the selection
    * wraps the box edge — that asymmetry is inherent to PBC, not to
    * the plan. */
  def periodicBoxCut(df: DataFrame,
      axes: Seq[(Column, Double, Double)], boxsize: Double): DataFrame = {
    require(boxsize > 0.0, "boxsize must be positive for PBC")
    val pred = axes.map { case (c, center, width) =>
      val d = abs(c - lit(center))
      val wrapped = when(d > lit(0.5 * boxsize), abs(lit(boxsize) - d)).otherwise(d)
      wrapped < lit(width / 2.0)
    }.reduce(_ && _)
    df.filter(pred)
  }
}
