package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.BitPositions

/** graft_bit_positions must decode exactly the set bits of a word
  * (ascending, offset by base) — the word-bitmap adjacency round trip
  * (ids → shifted bits → bit_or → positions) has to be lossless. */
class BitPositionsSpec extends SparkSpec {
  import spark.implicits._

  private def expected(bits: Long, base: Long): Seq[Long] =
    (0 until 64).filter(i => ((bits >>> i) & 1L) == 1L).map(base + _)

  test("positions match the reference bit scan across patterns") {
    val words = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue,
      0x8000000000000001L, 0x5555555555555555L, 0xdeadbeefL)
    for (w <- words; base <- Seq(0L, 64L, 1920L)) {
      val got = Seq((w, base)).toDF("bits", "base")
        .select(BitPositions.of(col("bits"), col("base")))
        .as[Seq[Long]].head()
      assert(got == expected(w, base), s"bits=$w base=$base")
    }
  }

  test("id set → bit_or words → exploded positions is lossless") {
    val ids = Seq(0L, 7L, 63L, 64L, 65L, 700L, 1999L, 700L) // dup collapses
    val got = ids.toDF("id")
      .select((col("id") / 64).cast("int").as("w"),
        expr("shiftleft(1L, cast(id % 64 as int))").as("bit"))
      .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
      .select(explode(BitPositions.of(col("bits"), col("w").cast("long") * 64)))
      .as[Long].collect().sorted.toSeq
    assert(got == ids.distinct.sorted)
  }

  test("zero word decodes to an empty array; null in → null out") {
    val df = Seq((Some(0L), 0L), (None, 0L)).toDF("bits", "base")
      .select(BitPositions.of(col("bits"), col("base")).as("p"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).isNullAt(0))
  }
}
