package graft.model

import org.apache.spark.sql.functions.lit

/** Physics derived fields — scida's registered extra-field library
  * (reference: src/scida/customs/arepo/extra_fields.py:36-60
  * `Temperature`; docs/derived_fields.md): fields every simulation
  * analysis recomputes, registered once on the dataset's derived-field
  * registry so they resolve lazily like any other field.
  *
  * Gas temperature from (ElectronAbundance, InternalEnergy):
  *
  *   μ = 4 / (1 + 3·x_H + 4·x_H·x_e) · m_p        (mean molecular weight)
  *   T = (γ−1) · u · μ / k_B · f                   [K]
  *
  * with x_H = 0.76, γ = 5/3, m_p and k_B in cgs, and `f` the factor
  * taking InternalEnergy to cgs specific energy (cm²/s²). The
  * reference hardcodes f = 1e10 — the standard Gadget (km/s)² system;
  * here it comes from the unit algebra when the field carries a
  * recorded unit (`Units.factor(u, "cm^2/s^2")`), falling back to the
  * same 1e10 when unitless. Everything folds into per-row arithmetic
  * of the shape C·u/(A + B·x_e) — three literals, codegen'd, no UDF.
  */
object PhysicsFields {

  private val XH = 0.76 // primordial hydrogen mass fraction
  private val Gamma = 5.0 / 3.0 // monatomic ideal gas
  private val MP = 1.672622e-24 // proton mass [g]
  private val KB = 1.380650e-16 // Boltzmann constant [erg/K]

  /** Denominator constants of μ: A + B·x_e. */
  val MuA: Double = 1.0 + 3.0 * XH
  val MuB: Double = 4.0 * XH

  /** The folded leading coefficient C(f) = f·(γ−1)·4·m_p/k_B, so that
    * T = C·u/(A + B·x_e). Public so an external replay (the DuckDB
    * oracle) computes the bit-identical constant. */
  def temperatureCoeff(f: Double): Double =
    f * (Gamma - 1.0) * 4.0 * MP / KB

  /** The f the unit algebra supplies for a dataset: InternalEnergy's
    * recorded unit → cm²/s², or the Gadget-standard 1e10 when the
    * field is unitless (extra_fields.py:48). */
  def energyCgsFactor(ds: GraftDataset): Double =
    ds.unitOf("InternalEnergy")
      .map(u => Units.factor(u, "cm^2/s^2"))
      .getOrElse(1e10)

  /** Register every physics field whose dependencies the dataset has.
    * Currently: gas Temperature [K]. Safe to call on any dataset —
    * missing dependencies mean no registration. */
  def attach(ds: GraftDataset): GraftDataset = {
    val names = ds.fieldNames.toSet
    if (Set("ElectronAbundance", "InternalEnergy").subsetOf(names) &&
        !names.contains("Temperature")) {
      val c = temperatureCoeff(energyCgsFactor(ds))
      ds.withDerivedQ("Temperature") { g =>
        Quantity(
          lit(c) * g.field("InternalEnergy") /
            (lit(MuA) + lit(MuB) * g.field("ElectronAbundance")),
          Units.parse("K"))
      }
    } else ds
  }
}
