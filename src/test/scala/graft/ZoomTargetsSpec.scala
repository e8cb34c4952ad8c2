package graft

import java.nio.file.Files
import graft.sources.hdf5.{ChunkedHdf5, Hdf5Writer, ZoomTargets}

/** Zoom-target selection — scida TNGClusterSelector semantics
  * (customs/arepo/TNGcluster/dataset.py:14) + the scale contract:
  * the row-range predicate prunes chunk partitions at the source.
  */
class ZoomTargetsSpec extends SparkSpec {
  import spark.implicits._

  /** 2 targets + 2 fuzz files: target 0 = ids 0-2, target 1 = ids
    * 10-11, fuzz 0 = ids 100-101, fuzz 1 = id 110. */
  private lazy val snapDir: String = {
    val dir = Files.createTempDirectory("graft_zoom").toString
    val chunks = Seq(
      Array(0L, 1L, 2L), Array(10L, 11L), Array(100L, 101L), Array(110L))
    chunks.zipWithIndex.foreach { case (ids, i) =>
      Hdf5Writer.write(s"$dir/snap.$i.hdf5", Hdf5Writer.Group(children = Seq(
        "Header" -> Hdf5Writer.Group(attrs = Seq(
          "Redshift" -> 0.5, "NumPart_ThisFile" ->
            Array(ids.length.toLong, 0L, 0L, 0L, 0L, 0L))),
        "PartType0" -> Hdf5Writer.Group(children = Seq(
          "ParticleIDs" -> Hdf5Writer.I64(ids))))))
    }
    dir
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("ParticleIDs").as[Long].collect().sorted.toSeq

  test("zoom selection: target span, withFuzz union, onlyFuzz") {
    val df = ChunkedHdf5.load(spark, snapDir, "PartType0")
    assert(ZoomTargets.nTargets(snapDir) == 2)
    assert(ids(ZoomTargets.select(df, snapDir, "PartType0", 0)) == Seq(0L, 1L, 2L))
    assert(ids(ZoomTargets.select(df, snapDir, "PartType0", 1)) == Seq(10L, 11L))
    assert(ids(ZoomTargets.select(df, snapDir, "PartType0", 0, withFuzz = true))
      == Seq(0L, 1L, 2L, 100L, 101L))
    assert(ids(ZoomTargets.select(df, snapDir, "PartType0", 1, onlyFuzz = true))
      == Seq(110L))
    // range check mirrors dataset.py:47
    intercept[IllegalArgumentException](
      ZoomTargets.select(df, snapDir, "PartType0", 2))
  }

  test("row-range predicate prunes chunk partitions at the source") {
    val df = ChunkedHdf5.load(spark, snapDir, "PartType0")
    // unfiltered: one partition per chunk file
    assert(df.rdd.getNumPartitions == 4)
    // a single-target selection must plan exactly that target's file
    val one = ZoomTargets.select(df, snapDir, "PartType0", 1)
    assert(one.rdd.getNumPartitions == 1,
      s"expected pruning to 1 chunk, got ${one.rdd.getNumPartitions}")
    // target + fuzz: the two relevant files only
    val two = ZoomTargets.select(df, snapDir, "PartType0", 0, withFuzz = true)
    assert(two.rdd.getNumPartitions == 2,
      s"expected pruning to 2 chunks, got ${two.rdd.getNumPartitions}")
    // results are exact, not just pruned (post-scan filter still runs)
    assert(ids(two) == Seq(0L, 1L, 2L, 100L, 101L))
  }
}
