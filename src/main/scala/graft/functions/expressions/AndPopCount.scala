package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** graft_and_popcount(a, b): Σ popcount(a(i) & b(i)) over the common
  * prefix of two array<long> bitmaps — the set-intersection
  * cardinality of two word-encoded bitsets in one codegen'd loop.
  *
  * The HOF spelling aggregate(zip_with(a, b, (x,y) -> bit_count(x &
  * y)), 0, +) is re-analyzed per run and interpreted per ELEMENT per
  * fold (one zipped array materialized per row, one lambda frame per
  * word); for triangle counting that is |E|·words interpreted steps
  * on the hot path. Elements must be non-null (the mask builders
  * coalesce missing words to 0L). */
case class AndPopCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_and_popcount"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AndPopCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.AndPopCount.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object AndPopCount {

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    acc
  }

  /** Column form: popcount of the bitwise AND of two long-array bitmaps. */
  def of(a: Column, b: Column): Column =
    GraftColumnBridge.column(AndPopCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
