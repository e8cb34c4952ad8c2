package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SeriesRegistry
import graft.sources.hdf5.Hdf5Writer

/** Series metadata registry — scida DatasetSeries.get_dataset
  * semantics (reference: src/scida/series.py:343-446) plus the scale
  * contract: member selection is driver-side; member DATA access
  * partition-prunes at the source.
  */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private val reg = SeriesRegistry(
    "snap0" -> Map("redshift" -> 4.0, "time" -> 0.2),
    "snap1" -> Map("redshift" -> 1.0, "time" -> 0.5),
    "snap2" -> Map("redshift" -> 0.0, "time" -> 1.0))

  test("selection by index, name, and nearest metadata value") {
    assert(reg.byIndex(1).name == "snap1")
    assert(reg.byName("snap2").name == "snap2")
    assert(reg.nearest("redshift", 1.003).name == "snap1")
    assert(reg.nearest(Map("redshift" -> 0.999, "time" -> 0.502)).name == "snap1")
    intercept[IllegalArgumentException](reg.byName("nope"))
  }

  test("tolerance and ambiguity errors mirror series.py:435-446") {
    // nearest is snap2 (z=0) but 0.5 is far outside 1% rtol of 0
    val e1 = intercept[IllegalArgumentException](reg.nearest("redshift", 0.5))
    assert(e1.getMessage.contains("tolerance"))
    // keys voting for different members → ambiguous
    val e2 = intercept[IllegalArgumentException](
      reg.nearest(Map("redshift" -> 4.0, "time" -> 1.0), reltol = 10.0))
    assert(e2.getMessage.contains("Ambiguous"))
    // no member carries the key
    intercept[IllegalArgumentException](reg.nearest("temperature", 1.0))
  }

  test("info lists members with their metadata") {
    val s = reg.info
    assert(s.contains("3 members") && s.contains("snap1") &&
      s.contains("redshift=1.0"))
  }

  test("registry builds from snapshot headers (fromSnapshots)") {
    val dirs = Seq(3.0, 1.0).zipWithIndex.map { case (z, i) =>
      val dir = Files.createTempDirectory(s"graft_series_$i").toString
      Hdf5Writer.write(s"$dir/snap.0.hdf5", Hdf5Writer.Group(children = Seq(
        "Header" -> Hdf5Writer.Group(attrs = Seq(
          "Time" -> (1.0 / (1.0 + z)), "Redshift" -> z, "HubbleParam" -> 0.6774)),
        "PartType0" -> Hdf5Writer.Group(children = Seq(
          "Masses" -> Hdf5Writer.F64(Array(1.0)))))))
      s"m$i" -> dir
    }
    val r = SeriesRegistry.fromSnapshots(dirs)
    assert(r.nearest("redshift", 2.99).name == "m0")
    assert(r.byName("m1").meta("time") == 0.5)
  }

  test("member load partition-prunes the snapshot-partitioned table") {
    val root = Files.createTempDirectory("graft_series_tbl").toString
    Seq(("snap0", 1L, 10.0), ("snap0", 2L, 20.0),
      ("snap1", 1L, 11.0), ("snap2", 1L, 12.0))
      .toDF("snapshot", "id", "v")
      .write.mode("overwrite").partitionBy("snapshot").parquet(root)
    val m = reg.nearest("redshift", 1.0)
    val df = reg.load(spark, root, m)
    val p = df.queryExecution.executedPlan.toString
    // the equality filter must land in PartitionFilters (pruned scan),
    // not as a post-scan Filter over all snapshots
    assert(p.contains("PartitionFilters") && p.contains("snapshot"), p.take(800))
    assert(p.contains("isnotnull(snapshot") || p.contains("(snapshot#"), p.take(800))
    assert(df.select("v").as[Double].collect().toSeq == Seq(11.0))
  }
}
