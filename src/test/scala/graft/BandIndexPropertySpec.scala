package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.expressions.BandIndex

/** Property test: BandIndex's binary search equals a linear scan over
  * arbitrary sorted non-overlapping interval tables. Pure catalyst
  * eval — no Spark jobs, thousands of cases in milliseconds. Seeded
  * generator (offline cache has no scalatest-scalacheck bridge). */
class BandIndexPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  private def randomBands(): Vector[(Double, Double)] = {
    val n = 1 + rng.nextInt(40)
    val edges = Vector.fill(2 * n)(rng.nextDouble() * 2000 - 1000).distinct.sorted
    edges.grouped(2).collect { case Vector(a, b) => (a, b) }.toVector
  }

  private def linearRef(v: Double, bands: Vector[(Double, Double)]): Option[Int] =
    bands.zipWithIndex.collectFirst {
      case ((lo, hi), i) if v >= lo && v < hi => i
    }

  test("binary search == linear scan across 1000 random band tables") {
    (1 to 1000).foreach { _ =>
      val bands = randomBands()
      val los = Literal.create(bands.map(_._1).toArray, ArrayType(DoubleType))
      val his = Literal.create(bands.map(_._2).toArray, ArrayType(DoubleType))
      // probe uniform values plus every boundary (the hard cases)
      val probes = Seq.fill(20)(rng.nextDouble() * 2200 - 1100) ++
        bands.flatMap { case (lo, hi) => Seq(lo, hi) }
      probes.foreach { v =>
        val got = Option(BandIndex(Literal(v), los, his).eval(null))
          .map(_.asInstanceOf[Int])
        assert(got == linearRef(v, bands), s"v=$v bands=$bands")
      }
    }
  }

  test("boundary semantics: inclusive lower, exclusive upper") {
    val los = Literal.create(Array(0.0, 10.0), ArrayType(DoubleType))
    val his = Literal.create(Array(10.0, 20.0), ArrayType(DoubleType))
    def at(v: Double) = Option(BandIndex(Literal(v), los, his).eval(null))
    assert(at(0.0).contains(0))
    assert(at(10.0).contains(1)) // exactly at the seam → upper band
    assert(at(20.0).isEmpty)
    assert(at(-0.001).isEmpty)
  }
}
