package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Series metadata registry — scida `DatasetSeries` member selection
  * (reference: src/scida/series.py:343 `get_dataset`, :449 `metadata`):
  * an ordered collection of snapshots with per-member scalar metadata
  * (redshift, time, …), selectable by index, name, or
  * nearest-metadata-value within a relative tolerance.
  *
  * The registry is tiny driver-side state (scida persists exactly
  * this as a per-series json cache file): N members × a few scalars.
  * Selection therefore never touches the cluster; the DATA path is
  * `member()`/`load()`, which turns the chosen member into a
  * partition filter on a snapshot-partitioned table — the scan prunes
  * to that member's files at the source (asserted on the plan in
  * SeriesSpec), so a 1000-snapshot series costs one snapshot's IO.
  */
final class SeriesRegistry(val members: Seq[SeriesRegistry.Member]) {
  import SeriesRegistry.Member

  require(members.map(_.name).distinct.size == members.size,
    "duplicate member names in series")

  def byIndex(i: Int): Member = members(i)

  def byName(name: String): Member =
    members.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"Name $name not found in this series.")) // series.py:384

  /** Nearest-metadata selection — series.py:397-446: among members
    * carrying ALL requested keys, pick the argmin of |meta - target|
    * per key; keys must agree on the winner (else "Ambiguous
    * selection request"), and the winner must be within `reltol`
    * relative tolerance of every requested value (else the tolerance
    * error, mirroring np.isclose(rtol)). */
  def nearest(targets: Map[String, Double], reltol: Double = 1e-2): Member = {
    require(targets.nonEmpty, "Specify some parameter to select for.")
    val candidates = members.filter(m => targets.keySet.subsetOf(m.meta.keySet))
    if (candidates.isEmpty)
      throw new IllegalArgumentException("No candidate found for given metadata.")
    val winners = targets.map { case (k, v) =>
      k -> candidates.minBy(m => math.abs(m.meta(k) - v))
    }
    if (winners.values.map(_.name).toSet.size > 1)
      throw new IllegalArgumentException("Ambiguous selection request")
    val m = winners.values.head
    targets.foreach { case (k, v) =>
      val have = m.meta(k)
      if (math.abs(v - have) > reltol * math.abs(have))
        throw new IllegalArgumentException(
          s"Candidate does not match tolerance for $k ($have vs $v requested)")
    }
    m
  }

  def nearest(key: String, value: Double): Member = nearest(Map(key -> value))

  /** Member roster + metadata — scida DatasetSeries info(). */
  def info: String =
    (s"SeriesRegistry (${members.size} members)" +:
      members.map(m => s"  ${m.name}: " +
        m.meta.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")))
      .mkString("\n")

  /** The chosen member's rows from a snapshot-partitioned table: the
    * equality filter on the partition column prunes at the source. */
  def load(spark: SparkSession, root: String, member: Member,
      partitionCol: String = "snapshot"): DataFrame =
    spark.read.parquet(root).filter(col(partitionCol) === member.name)
}

object SeriesRegistry {
  /** One series member: snapshot name (the partition value) and its
    * scalar metadata (redshift, time, …). */
  final case class Member(name: String, meta: Map[String, Double])

  def apply(members: (String, Map[String, Double])*): SeriesRegistry =
    new SeriesRegistry(members.map { case (n, m) => Member(n, m) })

  /** Build a registry from chunked-HDF5 snapshot directories by
    * reading each member's header cosmology — the scida flow where
    * series metadata comes from per-member `load_metadata`
    * (series.py:449 + io/_base.py:366). */
  def fromSnapshots(dirs: Seq[(String, String)]): SeriesRegistry =
    new SeriesRegistry(dirs.map { case (name, path) =>
      val attrs = graft.sources.hdf5.ChunkedHdf5.attrs(path)
      val z = graft.model.Cosmology.redshiftFromAttrs(attrs)
      val t = attrs.getOrElse("/Header", Map.empty).get("Time")
        .collect { case d: Double => d }
      Member(name, (z.map("redshift" -> _) ++ t.map("time" -> _)).toMap)
    })
}
