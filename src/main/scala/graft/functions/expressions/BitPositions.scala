package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** graft_bit_positions(bits, base): the set-bit positions of a 64-bit
  * word, each offset by `base` — output array<long> ascending.
  *
  * The decoder for word-bitmap adjacency aggregates (`groupBy(key,
  * word) agg bit_or(bit)`): a bounded-domain edge set compresses
  * ~64x through the exchange as (key, word, bits) rows, and consumers
  * that need the individual ids back (per-target scatter sums,
  * frontier expansion) re-expand with one codegen'd popcount loop
  * instead of an interpreted transform+filter HOF pair per word. */
case class BitPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bit_positions"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(bits: Any, base: Any): Any =
    BitPositions.compute(bits.asInstanceOf[Long], base.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, o) =>
      s"graft.functions.expressions.BitPositions.compute($b, $o)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BitPositions {

  def compute(bits: Long, base: Long): ArrayData = {
    val n = java.lang.Long.bitCount(bits)
    val out = new Array[Any](n)
    var rest = bits
    var o = 0
    while (rest != 0L) {
      val i = java.lang.Long.numberOfTrailingZeros(rest)
      out(o) = base + i
      o += 1
      rest &= rest - 1L
    }
    new GenericArrayData(out)
  }

  /** Column form: set-bit positions of `bits` offset by `base`. */
  def of(bits: Column, base: Column): Column =
    GraftColumnBridge.column(BitPositions(
      GraftColumnBridge.expression(bits), GraftColumnBridge.expression(base)))
}
