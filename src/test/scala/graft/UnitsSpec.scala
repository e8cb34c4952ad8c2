package graft

import org.apache.spark.sql.functions._
import graft.model.{GraftDataset, Quantity, Units}

/** Unit algebra — scida UnitMixin / pint semantics (reference:
  * src/scida/interfaces/mixins/units.py): composition through
  * multiply/divide, dimension-checked conversion, auto-convert on
  * addition, propagation through derived fields.
  */
class UnitsSpec extends SparkSpec {
  import spark.implicits._

  test("composite parse and canonical round-trip") {
    val rho = Units.parse("Msun/kpc^3")
    assert(rho.syms == Map("Msun" -> 1, "kpc" -> -3))
    assert(rho.toString == "Msun/kpc^3")
    assert(Units.parse(rho.toString) == rho)
    assert(Units.parse("km/s").dimension.toString == "length time^-1")
    assert(Units.parse("1/s").syms == Map("s" -> -1))
    assert(Units.parse("kg*m/s^2").dimension ==
      Units.parse("Msun*kpc/hr^2").dimension) // force dimension, any flavor
    intercept[IllegalArgumentException](Units.parse("furlong"))
  }

  test("measure algebra: multiply, divide, pow") {
    val m = Units.parse("Msun")
    val v = Units.parse("kpc").pow(3)
    assert((m / v).toString == "Msun/kpc^3")
    assert((m / v) * v == m)
    assert(Units.parse("km/s").pow(2).toString == "km^2/s^2")
  }

  test("conversion factors, including composite, reject dimension mismatch") {
    assert(Units.factor("kpc", "pc") == 1000.0)
    // Msun/kpc^3 → kg/m^3: both sides through SI
    val f = Units.factor("Msun/kpc^3", "kg/m^3")
    val expect = 1.98892e30 / math.pow(3.0856775814913673e19, 3)
    assert(math.abs(f - expect) / expect < 1e-12)
    intercept[IllegalArgumentException](Units.factor("Msun", "kpc"))
    intercept[IllegalArgumentException](Units.factor("Msun/kpc^3", "kg/m^2"))
  }

  test("quantity arithmetic composes units and auto-converts on +") {
    val df = Seq((10.0, 2.0, 0.5)).toDF("mass", "vol", "extra_kg")
    val mass = Quantity(col("mass"), Units.parse("Msun"))
    val vol = Quantity(col("vol"), Units.parse("kpc^3"))
    val rho = mass / vol
    assert(rho.unit.toString == "Msun/kpc^3")
    // + auto-converts the right side (kg → Msun here)
    val total = mass + Quantity(col("extra_kg"), Units.parse("kg"))
    assert(total.unit.toString == "Msun")
    val Array(r) = df.select(total.as("t")).as[Double].collect()
    assert(math.abs(r - (10.0 + 0.5 / 1.98892e30)) < 1e-12)
    // + across dimensions throws at plan time
    intercept[IllegalArgumentException](mass + vol)
  }

  test("to_base_units and physical-constant units (E = mc^2 -> erg)") {
    val df = Seq(2.0).toDF("speed") // km/s
    val v = Quantity(col("speed"), Units.parse("km/s"))
    val base = v.toBaseUnits
    assert(base.unit.toString == "m/s")
    assert(df.select(base.as("b")).as[Double].head() == 2000.0)
    // rest energy: mass [Msun] × c² expressed through the unit algebra
    val e = Quantity(lit(1.0), Units.parse("Msun*c^2")).to("erg")
    assert(e.unit.toString == "erg")
    val Array(ergs) = Seq(1).toDF("x").select(e.as("e")).as[Double].collect()
    val expect = 1.98892e30 * 299792458.0 * 299792458.0 * 1e7
    assert(math.abs(ergs - expect) / expect < 1e-12)
    // temperature has its own dimension
    intercept[IllegalArgumentException](Units.factor("K", "s"))
  }

  test("units round-trip through parquet column metadata (fromStamped)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_unit_rt").toString + "/t"
    val ds = GraftDataset(Seq((1.0, 2.0)).toDF("mass", "x"))
      .withUnit("mass", "Msun").withUnit("x", "kpc")
    ds.select("mass", "x").write.parquet(dir)
    val back = GraftDataset.fromStamped(spark.read.parquet(dir))
    assert(back.unitOf("mass").contains("Msun"))
    assert(back.unitOf("x").contains("kpc"))
    // restored units re-enter the algebra
    assert((back.q("mass") / back.q("x").pow(3)).unit.toString == "Msun/kpc^3")
  }

  test("sqrt halves unit exponents; odd exponents error (pint fractional-dim rule)") {
    val df = Seq(4.0, 9.0).toDF("v2")
    val ds = GraftDataset(df).withUnit("v2", "km^2/s^2")
    val disp = ds.q("v2").sqrt
    assert(disp.unit.toString == "km/s")
    val vals = df.select(disp.as("v")).as[Double].collect().sorted
    assert(vals.toSeq == Seq(2.0, 3.0))
    // km^3 has no exact square root
    val bad = GraftDataset(df).withUnit("v2", "km^3/s^2")
    val e = intercept[RuntimeException](bad.q("v2").sqrt)
    assert(e.getMessage.contains("root"))
  }

  test("derived fields propagate computed units end-to-end") {
    val df = Seq((4.0, 2.0), (9.0, 3.0)).toDF("mass", "vol")
    val ds = GraftDataset(df)
      .withUnit("mass", "Msun").withUnit("vol", "kpc^3")
      .withDerivedQ("rho")(g => g.q("mass") / g.q("vol"))
      .withDerivedQ("rho_cgs")(g => g.q("rho").to("g/cm^3"))
    assert(ds.unitOf("rho").contains("Msun/kpc^3"))
    assert(ds.unitOf("rho_cgs").contains("g/cm^3"))
    // unit metadata is stamped on selected output columns
    val out = ds.select("rho", "rho_cgs")
    assert(out.schema("rho").metadata.getString("unit") == "Msun/kpc^3")
    assert(out.schema("rho_cgs").metadata.getString("unit") == "g/cm^3")
    val rows = out.orderBy("rho").as[(Double, Double)].collect()
    val f = Units.factor("Msun/kpc^3", "g/cm^3")
    assert(rows.toSeq == Seq((2.0, 2.0 * f), (3.0, 3.0 * f)))
    // convertTo still dimension-checks composite units
    intercept[IllegalArgumentException](ds.convertTo("rho", "Msun"))
  }

  test("custom unit definitions (pint ureg.define, docs/units.md:99)") {
    // the docs' own example: halfmeter = 0.5 * m
    Units.define("halfmeter = 0.5 * m")
    assert(Units.factor("m", "halfmeter") == 2.0)
    assert(Units.factor("halfmeter", "cm") == 50.0)
    // composite right side, no numeric factor
    Units.define("kms = km/s")
    assert(Units.factor("kms", "m/s") == 1000.0)
    // custom units compose through the algebra like shipped ones
    assert(Units.factor("Msun/halfmeter^3", "Msun/m^3") == 8.0)
    // dimension checks still apply
    intercept[IllegalArgumentException](Units.factor("halfmeter", "s"))
    // idempotent redefinition ok; conflicting redefinition errors
    Units.define("halfmeter = 0.5 * m")
    intercept[IllegalArgumentException](Units.define("halfmeter = 0.7 * m"))
    // shipped symbols are protected
    intercept[IllegalArgumentException](Units.define("m = 2 * cm"))
    // malformed specs error clearly
    intercept[IllegalArgumentException](Units.define("no_equals_here"))
  }
}
