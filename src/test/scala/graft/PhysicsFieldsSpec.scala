package graft

import java.nio.file.Files
import graft.model.{GraftDataset, PhysicsFields}
import graft.sources.Load
import graft.sources.zarr.ZarrWriter

/** Physics derived fields — scida extra_fields.py:36-60 Temperature. */
class PhysicsFieldsSpec extends SparkSpec {
  import spark.implicits._

  test("Temperature = (γ−1)·u·μ/k_B·f against a hand evaluation") {
    val df = Seq((1L, 0.0, 1e4), (2L, 1.0, 1e4), (3L, 0.5, 2e4))
      .toDF("id", "ElectronAbundance", "InternalEnergy")
    val ds = PhysicsFields.attach(GraftDataset(df)) // unitless → f = 1e10
    assert(ds.unitOf("Temperature").contains("K"))
    val got = ds.select("id", "Temperature").orderBy("id")
      .as[(Long, Double)].collect().map(_._2)
    def ref(xe: Double, u: Double): Double = {
      val xh = 0.76; val mp = 1.672622e-24; val kb = 1.380650e-16
      val mu = 4.0 / (1.0 + 3.0 * xh + 4.0 * xh * xe) * mp
      1e10 * (5.0 / 3.0 - 1.0) * u / kb * mu
    }
    val want = Seq(ref(0.0, 1e4), ref(1.0, 1e4), ref(0.5, 2e4))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) / w < 1e-12, s"$g vs $w") }
    // physically sensible: u = 1e4 (km/s)^2 of ionized gas is ~5e5 K
    assert(got(1) > 1e5 && got(1) < 1e7)
  }

  test("attach is dependency-gated and idempotent") {
    val bare = GraftDataset(Seq((1L, 2.0)).toDF("id", "InternalEnergy"))
    assert(!PhysicsFields.attach(bare).fieldNames.contains("Temperature"))
    val full = PhysicsFields.attach(GraftDataset(
      Seq((1L, 0.1, 1e3)).toDF("id", "ElectronAbundance", "InternalEnergy")))
    // second attach must not re-register over the existing field
    assert(PhysicsFields.attach(full).fieldNames.count(_ == "Temperature") == 1)
  }

  test("Load.dataset auto-registers Temperature for the arepo family") {
    val dir = Files.createTempDirectory("graft_physics").toString
    ZarrWriter.write(dir, Seq(
      "ElectronAbundance" -> ZarrWriter.F64(Array(0.2, 0.8)),
      "InternalEnergy" -> ZarrWriter.F64(Array(1e4, 3e4))),
      attrs = Map("/" -> Map("Git_commit" -> "0badc0de", "Redshift" -> 1.0,
        "HubbleParam" -> 0.6774)))
    val ds = Load.dataset(spark, dir)
    assert(ds.fieldNames.contains("Temperature"))
    assert(ds.unitOf("Temperature").contains("K"))
    assert(ds.select("Temperature").as[Double].collect().forall(_ > 0))
  }
}
