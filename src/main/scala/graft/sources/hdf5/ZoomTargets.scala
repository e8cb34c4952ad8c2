package graft.sources.hdf5

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Zoom-target selection for TNG-Cluster-style zoom simulations —
  * scida's `TNGClusterSelector` (reference:
  * src/scida/customs/arepo/TNGcluster/dataset.py:14, offsets built at
  * :200-238): the snapshot concatenates one chunk file per zoom
  * target followed by one "fuzz" file per target (file i holds target
  * i's original-resolution particles, file i + nTargets its fuzz —
  * low-res contaminant particles in the zoom region), so selecting a
  * target is a contiguous row-range slice, optionally unioned with
  * its fuzz range.
  *
  * graft's loader virtually concatenates chunks in the same file
  * order and exposes the global position as `row_id`, so the selector
  * is a row-range predicate — which the `graft-hdf5` source uses to
  * PRUNE chunk partitions at planning (RowIdPruning): a 352-target
  * cluster run reads 1-2 files per query, not 704. Span metadata
  * comes from the memoized per-chunk headers (scida reads the same
  * NumPart_ThisFile concatenation); no data is touched on the driver.
  */
object ZoomTargets {

  /** Per-chunk-file [start, end) global-row spans of `group`, in the
    * loader's concatenation order. */
  def fileSpans(path: String, group: String,
      fileprefix: String = ""): Seq[(Long, Long)] = {
    val files = ChunkedHdf5.discoverChunks(path, fileprefix)
    val counts = files.map(f => ChunkedHdf5.rowCount(f, group))
    val offs = counts.scanLeft(0L)(_ + _)
    counts.indices.map(i => (offs(i), offs(i) + counts(i)))
  }

  /** Number of zoom targets: half the chunk files (target files then
    * fuzz files — TNGcluster/dataset.py:197 "each zoom-target has two
    * entries i and i+N"). */
  def nTargets(path: String, fileprefix: String = ""): Int = {
    val n = ChunkedHdf5.discoverChunks(path, fileprefix).size
    require(n % 2 == 0,
      s"zoom snapshot must pair each target file with a fuzz file; got $n chunks")
    n / 2
  }

  /** Rows of `df` (a `ChunkedHdf5.load` frame of `path`/`group`)
    * belonging to zoom target `zoomId` — selector semantics of
    * TNGClusterSelector.prepare: the target's span, plus its fuzz span
    * with `withFuzz`, or the fuzz span alone with `onlyFuzz`. */
  def select(df: DataFrame, path: String, group: String, zoomId: Int,
      withFuzz: Boolean = false, onlyFuzz: Boolean = false,
      fileprefix: String = ""): DataFrame = {
    val n = nTargets(path, fileprefix)
    require(zoomId >= 0 && zoomId < n,
      s"zoomID must be in range 0-${n - 1}") // dataset.py:47
    val spans = fileSpans(path, group, fileprefix)
    def in(span: (Long, Long)) =
      col("row_id") >= span._1 && col("row_id") < span._2
    val main = in(spans(zoomId))
    val fuzz = in(spans(zoomId + n))
    df.filter(
      if (onlyFuzz) fuzz
      else if (withFuzz) main || fuzz
      else main)
  }
}
