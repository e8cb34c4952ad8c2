package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** A unit-carrying column — the pint.Quantity analogue for Catalyst
  * (reference: src/scida/interfaces/mixins/units.py: scida fields are
  * pint quantities, so `rho = mass/vol` yields Msun/kpc³
  * automatically and `+` across dimensions raises).
  *
  * The column side is ordinary Catalyst expression algebra (codegen'd,
  * optimizable); the unit side is driver-only symbolic algebra on
  * `Units.Measure`. Addition/subtraction auto-convert the right side
  * to the left's unit (one literal multiply), matching pint; any
  * dimension mismatch throws at PLAN time, not at execution time —
  * on a 1000-executor job that's the difference between an instant
  * error and a wasted cluster-hour.
  */
final case class Quantity(col: Column, unit: Units.Measure) {

  def *(o: Quantity): Quantity = Quantity(col * o.col, unit * o.unit)
  def /(o: Quantity): Quantity = Quantity(col / o.col, unit / o.unit)

  def +(o: Quantity): Quantity = Quantity(col + align(o), unit)
  def -(o: Quantity): Quantity = Quantity(col - align(o), unit)

  /** o's column expressed in THIS quantity's unit (pint auto-convert
    * on addition; throws on dimension mismatch). */
  private def align(o: Quantity): Column = {
    val f = Units.factor(o.unit, unit) // validates dimensions
    if (f == 1.0) o.col else o.col * lit(f)
  }

  def *(k: Double): Quantity = Quantity(col * lit(k), unit)
  def /(k: Double): Quantity = Quantity(col / lit(k), unit)

  def pow(n: Int): Quantity = {
    require(n != 0, "pow(0) would erase the column; use lit(1)")
    val c = Iterator.fill(math.abs(n))(col).reduce(_ * _)
    Quantity(if (n > 0) c else lit(1.0) / c, unit.pow(n))
  }

  /** Square root with unit exponents halved — pint sqrt(quantity)
    * (velocity dispersions, rms field amplitudes); errors when any
    * exponent is odd, as pint does on fractional dimensions. */
  def sqrt: Quantity =
    Quantity(org.apache.spark.sql.functions.sqrt(col), unit.root(2))

  /** Convert to `target` (composite expressions allowed): one literal
    * multiply, dimension-checked — pint's `.to()`. */
  def to(target: String): Quantity = {
    val t = Units.parse(target)
    val f = Units.factor(unit, t)
    Quantity(if (f == 1.0) col else col * lit(f), t)
  }

  /** Convert to SI base units (m/kg/s/K powers) — pint
    * to_base_units(). */
  def toBaseUnits: Quantity = {
    val base = Units.baseMeasure(unit.dimension)
    val f = Units.factor(unit, base)
    Quantity(if (f == 1.0) col else col * lit(f), base)
  }

  def as(name: String): Column = col.as(name)
}

object Quantity {
  /** Dimensionless wrapper for bare columns entering unit arithmetic. */
  def bare(col: Column): Quantity = Quantity(col, Units.dimensionless)
}
