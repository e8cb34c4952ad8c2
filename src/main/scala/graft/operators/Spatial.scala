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

  /** Two-point correlation pair counts (the DD term of the
    * Peebles–Hauser / Landy–Szalay estimators — the statistic scida's
    * spatial mixin exists to feed; reference: src/scida/mixins/
    * spatial.py's cutout machinery is the prefilter step of exactly
    * this computation): the number of unordered point pairs with
    * separation r < `rMax`, histogrammed into `floor(r/binWidth)`
    * radial bins.
    *
    * Distributed shape (the standard grid / chaining-mesh decomposition
    * used by corrfunc-style pair counters): every point maps to a cubic
    * cell of side `rMax`; the RIGHT copy of the corpus registers under
    * its own cell plus the 13 lexicographically-FORWARD neighbor
    * offsets (half the 26-shell — each unordered cell pair is probed in
    * exactly one orientation), candidates meet on CELL-KEY EQUALITY —
    * one hash-partitioned equi-join, never a cross product — and the
    * exact distance verifies candidates only. Same-cell pairs dedupe on
    * id ordering; cross-cell pairs are unique by the forward-shell
    * construction. The aggregation is O(bins) with map-side partial
    * combine, so the shuffle after the join carries bin partials, not
    * pairs. At 100 TB the candidate volume is N × 14 × (cell
    * occupancy): bounded by density, independent of total N — the
    * right-side 14× registration is the whole replication cost.
    * Distances are rounded at `digits` dp before binning/thresholding
    * (sqrt is not cross-engine exact-rounded; parity protocol). */
  /** The candidate-pair stream pairCounts aggregates and fofGroups
    * links: one row per unordered point pair with separation
    * `rn/10^digits < rMax`, discovered through the grid forward-shell
    * equi-join (see pairCounts for the full shape discussion).
    * Returns (__ida, __idb, __rn) — integer-`digits` distances. */
  def neighborPairs(points: DataFrame, idCol: String,
      x: Column, y: Column, z: Column,
      rMax: Double, digits: Int = 9): DataFrame = {
    require(rMax > 0, "rMax must be positive")
    val reserved = Seq("__cx", "__cy", "__cz", "__px", "__py", "__pz")
    require(!reserved.exists(points.columns.contains),
      "__c*/__p* columns are reserved by neighborPairs; rename the input column")
    def cellOf(c: Column) = floor(c / lit(rMax)).cast("long")
    val base = points.select(col(idCol), x.as("__px"), y.as("__py"), z.as("__pz"),
      cellOf(x).as("__cx"), cellOf(y).as("__cy"), cellOf(z).as("__cz"))
    // forward half-shell: (0,0,0) + the 13 offsets lexicographically
    // greater than zero — each unordered neighbor-cell pair probed once
    val offsets = for {
      dx <- -1 to 1; dy <- -1 to 1; dz <- -1 to 1
      if (dx, dy, dz) != (0, 0, 0) &&
        (dx > 0 || (dx == 0 && (dy > 0 || (dy == 0 && dz > 0))))
    } yield (dx, dy, dz)
    val offLit = typedLit((0, 0, 0) +: offsets)
    val left = base.select(col(idCol).as("__ida"),
      col("__px").as("__xa"), col("__py").as("__ya"), col("__pz").as("__za"),
      col("__cx"), col("__cy"), col("__cz"))
    // right registers under cell − offset: a match means
    // cell(right) − cell(left) = offset, a forward (or zero) shift
    val right = base
      .withColumn("__o", explode(offLit))
      .select(col(idCol).as("__idb"),
        col("__px").as("__xb"), col("__py").as("__yb"), col("__pz").as("__zb"),
        (col("__cx") - col("__o._1")).as("__cx"),
        (col("__cy") - col("__o._2")).as("__cy"),
        (col("__cz") - col("__o._3")).as("__cz"),
        (col("__o._1") === 0 && col("__o._2") === 0 && col("__o._3") === 0)
          .as("__self"))
    val dx = col("__xb") - col("__xa")
    val dy = col("__yb") - col("__ya")
    val dz = col("__zb") - col("__za")
    // integer-nano distances: the ONE non-exact-rounded op (sqrt) is
    // floored to integer nanos per pair, so bin ids, thresholds and
    // the mean's sum are exact integer arithmetic on any engine and
    // any partition order (the ngram_lm_score discipline)
    val scale = math.pow(10, digits)
    val rNanos = floor(sqrt(dx * dx + dy * dy + dz * dz) * lit(scale) + lit(0.5))
      .cast("long")
    left.join(right, Seq("__cx", "__cy", "__cz"))
      .filter(!col("__self") || col("__ida") < col("__idb"))
      .withColumn("__rn", rNanos)
      .filter(col("__rn") < lit((rMax * scale).toLong))
      .select("__ida", "__idb", "__rn")
  }

  def pairCounts(points: DataFrame, idCol: String,
      x: Column, y: Column, z: Column,
      rMax: Double, binWidth: Double, digits: Int = 9): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val scale = math.pow(10, digits)
    val binNanos = binWidth * scale
    require(binNanos == math.rint(binNanos),
      s"binWidth must be exact at $digits digits")
    neighborPairs(points, idCol, x, y, z, rMax, digits)
      .groupBy(floor(col("__rn").cast("double") / lit(binNanos)).cast("int")
        .as("bin"))
      .agg(count(lit(1)).as("dd"),
        graft.functions.VectorOps.roundAt(
          sum(col("__rn")).cast("double") / (count(lit(1)) * lit(scale.toLong))
            .cast("double"), 6).as("mean_r"))
      // O(bins) result — single-task local sort (QueryDef.sortSmall)
      .coalesce(1).sortWithinPartitions("bin")
  }

  /** Friends-of-friends group finder (THE classic halo finder —
    * Davis et al. 1985; the subhalo/group machinery scida loads from
    * Gadget/Arepo catalogs is produced by exactly this algorithm at
    * simulation time): two points closer than the linking length are
    * friends; groups are the transitive closure. Pairs come from the
    * grid forward-shell equi-join (candidate volume bounded by
    * density, never N²); the closure is Dedup.connectedComponents —
    * bounded union-find when the edge list is small, large-star/
    * small-star O(log n) distributed rounds otherwise. Every
    * particle gets its group's minimum member id as `fof_group`
    * (singletons label themselves). */
  def fofGroups(points: DataFrame, idCol: String,
      x: Column, y: Column, z: Column, linkLen: Double): DataFrame = {
    val pairs = neighborPairs(points, idCol, x, y, z, linkLen)
      .select(col("__ida"), col("__idb"))
    graft.dedup.Dedup.connectedComponents(
        points.select(col(idCol)), pairs)
      .select(col(idCol), col("cluster").as("fof_group"))
  }

  /** Cloud-in-cell (CIC) mass deposition onto a periodic 3-D grid —
    * the standard density-field estimator astro pipelines run before
    * power spectra / density analysis (scida's docs recipes bin
    * particle mass onto grids with dask histogramdd; CIC is the
    * order-2 version of that deposit). Each particle spreads unit
    * mass over its 8 surrounding cells with trilinear weights;
    * per-axis the two cells are floor(x/h − ½) and its successor,
    * wrapped periodically.
    *
    * Distributed shape: a map-side 8-way explode (each contribution a
    * (cell, weight) pair — bounded 8× row expansion, no join), then
    * ONE hash aggregation keyed by cell id with map-side partial
    * combine: the shuffle carries O(grid³) partials per task, never
    * particles. Weights are floored to integer micros per
    * CONTRIBUTION, so cell totals are exact integer sums on any
    * engine and any partition order (the ngram_lm_score discipline).
    * At 100 TB this is scan → explode → one bounded-key shuffle —
    * embarrassingly scalable; grid resolution only changes the
    * aggregation key space. */
  def cicDeposit(points: DataFrame,
      x: Column, y: Column, z: Column,
      boxSize: Double, gridN: Int): DataFrame =
    cicDepositUnsorted(points, x, y, z, boxSize, gridN)
      // O(grid³ occupied cells) result — single-task local sort, no
      // range exchange / sampling wave (QueryDef.sortSmall rationale)
      .coalesce(1).sortWithinPartitions("cell_x", "cell_y", "cell_z")

  /** [[cicDeposit]] without the output ordering — for consumers that
    * immediately re-aggregate the grid (power spectra, profile
    * stacks): the range exchange + sort would be pure waste between
    * two hash aggregations. */
  def cicDepositUnsorted(points: DataFrame,
      x: Column, y: Column, z: Column,
      boxSize: Double, gridN: Int): DataFrame = {
    require(gridN > 0 && boxSize > 0, "gridN and boxSize must be positive")
    val h = boxSize / gridN
    def axis(c: Column): (Column, Column) = {
      val xi = c / lit(h)
      val i = floor(xi - lit(0.5)).cast("long")
      val f = (xi - lit(0.5)) - i.cast("double")
      (i, f)
    }
    val (ix, fx) = axis(x); val (iy, fy) = axis(y); val (iz, fz) = axis(z)
    val dxs = Seq(0, 1)
    // 8 trilinear contributions, built as one array column and
    // exploded — map-side only, no join
    val contribCols = dxs.flatMap(dx => dxs.flatMap(dy => dxs.map { dz =>
      def side(i: Column, f: Column, d: Int): (Column, Column) = {
        val cell = pmod(i + lit(d.toLong), lit(gridN.toLong))
        val w = if (d == 0) lit(1.0) - f else f
        (cell, w)
      }
      val (cx, wx) = side(ix, fx, dx)
      val (cy, wy) = side(iy, fy, dy)
      val (cz, wz) = side(iz, fz, dz)
      struct(cx.as("cx"), cy.as("cy"), cz.as("cz"),
        floor(wx * wy * wz * lit(1000000.0) + lit(0.5)).cast("long")
          .as("w_micro"))
    }))
    val contribs = array(contribCols: _*)
    points.select(explode(contribs).as("c"))
      .groupBy(col("c.cx").as("cell_x"), col("c.cy").as("cell_y"),
        col("c.cz").as("cell_z"))
      .agg(count(lit(1)).as("n_contrib"),
        sum(col("c.w_micro")).as("mass_micro"))
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
