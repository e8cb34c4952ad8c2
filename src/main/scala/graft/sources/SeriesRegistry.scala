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

  // ---- JSON sidecar cache — scida's per-series metadata file
  // (series.py:449-470 `metadata` property: a json cache so
  // re-opening a 100-snapshot series is ONE file read, not 100
  // per-member header walks). graft's sidecar additionally validates
  // per member-chunk (mtime, size) — a stat, never an HDF5 parse —
  // with the MetadataCache stamping rule (stamps observed BEFORE the
  // build, so a mid-build rewrite can't bind new stamps to old
  // metadata). Corrupt/stale/mismatched sidecars rebuild; cache I/O
  // failures never fail an open. ----

  private val SidecarVersion = 1

  /** Load-or-build through the sidecar at `sidecarPath` (conventionally
    * `<seriesRoot>/.graft_series.json`). A warm open is one JSON read
    * plus one stat per chunk file. */
  def fromSnapshotsCached(dirs: Seq[(String, String)],
      sidecarPath: String): SeriesRegistry = {
    val f = new java.io.File(sidecarPath)
    loadSidecar(f, dirs).getOrElse {
      val stamps = dirs.map { case (_, p) => chunkStamps(p) }
      val reg = fromSnapshots(dirs)
      storeSidecar(f, dirs, stamps, reg)
      reg
    }
  }

  private def chunkStamps(path: String): Seq[(String, Long, Long)] =
    graft.sources.hdf5.ChunkedHdf5.discoverChunks(path).map { c =>
      val f = new java.io.File(c)
      (f.getCanonicalPath, f.lastModified(), f.length())
    }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  private def storeSidecar(f: java.io.File, dirs: Seq[(String, String)],
      stamps: Seq[Seq[(String, Long, Long)]], reg: SeriesRegistry): Unit =
    try {
      val members = dirs.zip(stamps).map { case ((name, path), st) =>
        val meta = reg.byName(name).meta.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${jstr(k)}: $v" }.mkString(", ")
        val files = st.map { case (p, m, sz) =>
          s"""{"p": ${jstr(p)}, "m": $m, "s": $sz}""" }.mkString(", ")
        s"""{"name": ${jstr(name)}, "path": ${jstr(path)}, "meta": {$meta}, "files": [$files]}"""
      }.mkString(",\n  ")
      val json = s"""{"version": $SidecarVersion, "members": [\n  $members\n]}\n"""
      val tmp = java.io.File.createTempFile(f.getName, ".tmp",
        Option(f.getParentFile).getOrElse(new java.io.File(".")))
      java.nio.file.Files.writeString(tmp.toPath, json)
      if (!tmp.renameTo(f)) tmp.delete() // atomic vs concurrent readers
    } catch { case _: Exception => () }

  /** The sidecar's registry, iff it covers exactly `dirs` and every
    * recorded chunk file still matches its (mtime, size). */
  private def loadSidecar(f: java.io.File,
      dirs: Seq[(String, String)]): Option[SeriesRegistry] =
    try {
      if (!f.isFile) return None
      val root = graft.sources.zarr.MiniJson
        .parse(java.nio.file.Files.readString(f.toPath))
        .asInstanceOf[Map[String, Any]]
      if (root.get("version").collect { case d: Double => d.toInt }
          .getOrElse(-1) != SidecarVersion) return None
      val ms = root("members").asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      // must cover exactly the requested members, in any order
      val byName = ms.map(m => m("name").asInstanceOf[String] -> m).toMap
      if (byName.keySet != dirs.map(_._1).toSet || ms.size != dirs.size)
        return None
      val members = dirs.map { case (name, path) =>
        val m = byName(name)
        if (m("path").asInstanceOf[String] != path) return None
        val ok = m("files").asInstanceOf[Seq[Any]]
          .map(_.asInstanceOf[Map[String, Any]]).forall { e =>
            val cf = new java.io.File(e("p").asInstanceOf[String])
            cf.isFile &&
              cf.lastModified() == e("m").asInstanceOf[Double].toLong &&
              cf.length() == e("s").asInstanceOf[Double].toLong
          }
        if (!ok) return None
        Member(name, m("meta").asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.asInstanceOf[Double] })
      }
      Some(new SeriesRegistry(members))
    } catch { case _: Exception => None }
}
