package graft.model

/** Minimal linear unit registry — the pint analogue behind scida's
  * units mixin (reference: src/scida/interfaces/mixins/units.py):
  * every unit maps to (dimension, factor-to-base); conversion between
  * units of the same dimension is a single multiplicative factor
  * (affine units like °C are out of scope, as in scida's field use).
  *
  * Deliberately driver-side and tiny: the factor becomes a literal in
  * the Catalyst plan (`GraftDataset.convertTo`), so unit conversion
  * costs one codegen'd multiply per row and nothing at shuffle time.
  */
object Units {

  /** unit symbol → (dimension, factor to the dimension's base unit) */
  private val registry: Map[String, (String, Double)] = Map(
    // length (base m)
    "m" -> ("length", 1.0), "km" -> ("length", 1e3), "cm" -> ("length", 1e-2),
    "pc" -> ("length", 3.0856775814913673e16),
    "kpc" -> ("length", 3.0856775814913673e19),
    "Mpc" -> ("length", 3.0856775814913673e22),
    // mass (base kg)
    "kg" -> ("mass", 1.0), "g" -> ("mass", 1e-3),
    "Msun" -> ("mass", 1.98892e30),
    // time (base s)
    "s" -> ("time", 1.0), "ms" -> ("time", 1e-3), "us" -> ("time", 1e-6),
    "ns" -> ("time", 1e-9), "hr" -> ("time", 3600.0),
    "Gyr" -> ("time", 3.15576e16),
    // velocity (base m/s)
    "m/s" -> ("velocity", 1.0), "km/s" -> ("velocity", 1e3),
    // dimensionless counting units
    "1" -> ("dimensionless", 1.0), "dozen" -> ("dimensionless", 12.0))

  def dimensionOf(unit: String): Option[String] = registry.get(unit).map(_._1)

  /** Multiplicative factor converting a quantity in `from` to `to`.
    * Throws for unknown units or dimension mismatch (same contract as
    * pint's DimensionalityError). */
  def factor(from: String, to: String): Double = {
    val (df_, ff) = registry.getOrElse(from,
      throw new IllegalArgumentException(s"unknown unit '$from'"))
    val (dt, ft) = registry.getOrElse(to,
      throw new IllegalArgumentException(s"unknown unit '$to'"))
    require(df_ == dt, s"cannot convert $from ($df_) to $to ($dt)")
    ff / ft
  }
}
