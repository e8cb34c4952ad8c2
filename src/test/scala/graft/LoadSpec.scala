package graft

import java.nio.file.Files
import graft.sources.Load
import graft.sources.hdf5.Hdf5Writer
import graft.sources.zarr.ZarrWriter

/** Format auto-detection — scida load()/discovertypes semantics
  * (reference: src/scida/convenience.py:287, src/scida/
  * discovertypes.py): sniff a path, pick the loader, attach mixins.
  */
class LoadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val hdf5Dir: String = {
    val dir = Files.createTempDirectory("graft_load_h5").toString
    Hdf5Writer.write(s"$dir/snap.0.hdf5", Hdf5Writer.Group(children = Seq(
      "Header" -> Hdf5Writer.Group(attrs = Seq(
        "Time" -> 0.5, "Redshift" -> 1.0, "HubbleParam" -> 0.6774)),
      "PartType0" -> Hdf5Writer.Group(children = Seq(
        "Masses" -> Hdf5Writer.F64(Array(1.0, 2.0)))))))
    dir
  }

  private lazy val zarrDir: String = {
    val dir = Files.createTempDirectory("graft_load_zarr").toString
    ZarrWriter.write(dir, Seq("Masses" -> ZarrWriter.F64(Array(3.0, 4.0))),
      attrs = Map("/" -> Map("Redshift" -> 2.0, "HubbleParam" -> 0.7)))
    dir
  }

  private lazy val parquetDir: String = {
    val dir = Files.createTempDirectory("graft_load_pq").toString + "/t"
    Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v").write.parquet(dir)
    dir
  }

  test("detect: zarr markers, hdf5 magic bytes, parquet part files") {
    assert(Load.detect(zarrDir) == Load.Zarr)
    assert(Load.detect(hdf5Dir) == Load.Hdf5)
    assert(Load.detect(s"$hdf5Dir/snap.0.hdf5") == Load.Hdf5)
    assert(Load.detect(parquetDir) == Load.Parquet)
    assert(Load.detect("/root/testdata/sf0.001/orders.parquet") == Load.Parquet)
    intercept[RuntimeException](Load.detect(Files.createTempDirectory("empty").toString))
  }

  test("dataFrame dispatches to the right source, end-to-end") {
    assert(Load.dataFrame(spark, parquetDir).count() == 2)
    // hdf5: sole data-bearing group is picked automatically
    val h5 = Load.dataFrame(spark, hdf5Dir)
    assert(h5.columns.contains("Masses") && h5.count() == 2)
    val z = Load.dataFrame(spark, zarrDir)
    assert(z.select("Masses").as[Double].collect().sorted.toSeq == Seq(3.0, 4.0))
  }

  test("flavor: family markers vote as in scida's per-class validate_path") {
    def snap(header: Seq[(String, Any)],
        extra: Seq[(String, Hdf5Writer.Node)] = Nil): String = {
      val dir = Files.createTempDirectory("graft_flavor").toString
      Hdf5Writer.write(s"$dir/s.0.hdf5", Hdf5Writer.Group(children =
        Seq("Header" -> Hdf5Writer.Group(attrs = header)) ++ extra ++
          Seq("PartType0" -> Hdf5Writer.Group(children = Seq(
            "Masses" -> Hdf5Writer.F64(Array(1.0)))))))
      dir
    }
    // swift: /Code Code contains SWIFT (swift/dataset.py:55)
    assert(Load.flavor(snap(Seq("Redshift" -> 0.0),
      extra = Seq("Code" -> Hdf5Writer.Group(attrs = Seq(
        "Code" -> "SWIFT v0.9"))))) == "swift")
    // gizmo: GIZMO_version in /Header (gizmo/dataset.py:84)
    assert(Load.flavor(snap(Seq("GIZMO_version" -> 2022L))) == "gizmo")
    // arepo: Git_commit without Compactify_Version (arepo/dataset.py:230)
    assert(Load.flavor(snap(Seq("Git_commit" -> "abc123"))) == "arepo")
    assert(Load.flavor(snap(Seq("Git_commit" -> "abc123",
      "Compactify_Version" -> 1L))) == "generic")
    // rockstar: a root-level /cosmology:omega_dm dataset
    // (rockstar/dataset.py:59)
    assert(Load.flavor(snap(Seq("Redshift" -> 0.0),
      extra = Seq("cosmology:omega_dm" ->
        Hdf5Writer.F64(Array(0.26))))) == "rockstar")
    // zarr stores carry the markers on the ROOT group attrs
    val zg = Files.createTempDirectory("graft_flavor_z").toString
    ZarrWriter.write(zg, Seq("Masses" -> ZarrWriter.F64(Array(1.0))),
      attrs = Map("/" -> Map("GIZMO_version" -> 2022L, "Redshift" -> 0.0)))
    assert(Load.flavor(zg) == "gizmo")
    // plain header: generic
    assert(Load.flavor(hdf5Dir) == "generic")
    assert(Load.flavor(parquetDir) == "generic")
  }

  test("particle-type aliases resolve (arepo/dataset.py:91): gas → PartType0") {
    assert(Load.resolveGroup("gas") == "PartType0")
    assert(Load.resolveGroup("black holes") == "PartType5")
    assert(Load.resolveGroup("PartType2") == "PartType2") // pass-through
    val viaAlias = Load.dataFrame(spark, hdf5Dir, "gas")
    assert(viaAlias.columns.contains("Masses") && viaAlias.count() == 2)
    // the dataset path resolves aliases for unit/default lookups too
    assert(Load.dataset(spark, hdf5Dir, "gas").fieldNames.contains("Masses"))
  }

  test("dataset attaches the cosmology mixin from snapshot metadata") {
    val dsH5 = Load.dataset(spark, hdf5Dir)
    assert(dsH5.cosmology.map(_.redshift).contains(1.0))
    assert(dsH5.cosmology.map(_.h).contains(0.6774))
    // zarr root attrs carry header keys; no Time key → z-only validates
    val dsZ = Load.dataset(spark, zarrDir)
    assert(dsZ.cosmology.map(_.redshift).contains(2.0))
    // plain parquet: no cosmology, still loads
    assert(Load.dataset(spark, parquetDir).cosmology.isEmpty)
  }

  test("findPath resolves names through the config registry (convenience.py:183)") {
    val root = java.nio.file.Files.createTempDirectory("graft_findpath")
    val dataFolder = root.resolve("sims"); java.nio.file.Files.createDirectories(dataFolder)
    val simDir = dataFolder.resolve("tng50-4"); java.nio.file.Files.createDirectories(simDir)
    val cfg = root.resolve("config.json")
    java.nio.file.Files.writeString(cfg,
      s"""{"datafolders": ["$dataFolder"],
         | "resources": {"tng": {"mini": {"path": "$simDir"}}}}""".stripMargin)
    // an existing path resolves to itself, no config needed
    assert(Load.findPath(simDir.toString, cfg.toString) == simDir.toString)
    // a bare name resolves through datafolders (first hit wins)
    assert(Load.findPath("tng50-4", cfg.toString) == simDir.toString)
    // backend://name resolves through resources
    assert(Load.findPath("tng://mini", cfg.toString) == simDir.toString)
    // the reference's error messages for the unknown cases
    val e1 = intercept[RuntimeException](Load.findPath("nope://x", cfg.toString))
    assert(e1.getMessage.contains("Unknown resource"))
    val e2 = intercept[RuntimeException](Load.findPath("tng://nope", cfg.toString))
    assert(e2.getMessage.contains("Unknown dataset"))
    val e3 = intercept[RuntimeException](Load.findPath("missing-name", cfg.toString))
    assert(e3.getMessage.contains("unknown"))
    // the download half is deliberately unsupported (zero egress)
    val e4 = intercept[RuntimeException](
      Load.findPath("https://example.org/data.tar.gz", cfg.toString))
    assert(e4.getMessage.contains("zero-egress"))
  }

  test("datasetByName opens a registered dataset end-to-end (convenience.py:399)") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsname")
    val cfg = root.resolve("config.json")
    java.nio.file.Files.writeString(cfg,
      s"""{"resources": {"sims": {"demo": {"path": "$hdf5Dir"}}}}""")
    val ds = Load.datasetByName(spark, "sims://demo", configPath = cfg.toString)
    assert(ds.cosmology.map(_.redshift).contains(1.0))
    assert(ds.fieldNames.contains("Masses"))
  }
}
