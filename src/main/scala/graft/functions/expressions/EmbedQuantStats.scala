package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** graft_embed_quant_stats(vec, mns, mxs): per-vector affine-uint8
  * quantization statistics — codes, their sum, index-weighted dot,
  * and reconstruction MSE — in ONE compiled loop.
  *
  * For element i (0-based), with lo = mns[i], hi = mxs[i]:
  *   step_i = (hi - lo) / 254.0
  *   code_i = floor((v_i - lo) / step_i + 0.5) as long   (0 when hi == lo)
  *   err_i  = v_i - (lo + code_i * step_i)               (0.0 when hi == lo)
  * and the outputs:
  *   q_sum     = Σ code_i
  *   q_dot     = Σ code_i * (i+1)
  *   recon_mse = (Σ err_i²) / n           (left-to-right accumulation)
  *
  * Replaces embedding_quantize's three interpreted higher-order folds
  * (transform + 2×aggregate + a 64-wide zip_with) whose expression
  * trees Catalyst re-analyzes per run and evaluates per element per
  * fold. Arithmetic is the IDENTICAL IEEE double sequence the fold
  * form (and the DuckDB oracle) runs — subtract, divide-by-step,
  * +0.5, floor; error accumulated left-to-right, divided once at the
  * end — so the hash gate stays exact. Rounding of recon_mse stays
  * OUTSIDE (VectorOps.roundAt), where the query applies it on both
  * engines.
  */
case class EmbedQuantStats(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "graft_embed_quant_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("q_sum", LongType, nullable = false),
    StructField("q_dot", LongType, nullable = false),
    StructField("recon_mse", DoubleType, nullable = false)))

  private lazy val vecElemIsFloat =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any, lo: Any, hi: Any): Any = {
    val va = v.asInstanceOf[ArrayData]
    val la = lo.asInstanceOf[ArrayData]
    val ha = hi.asInstanceOf[ArrayData]
    val n = va.numElements()
    var qSum = 0L
    var qDot = 0L
    var se = 0.0
    var i = 0
    while (i < n) {
      val x = if (vecElemIsFloat) va.getFloat(i).toDouble else va.getDouble(i)
      val mn = la.getDouble(i)
      val mx = ha.getDouble(i)
      var code = 0L
      var err = 0.0
      // degenerate-dimension test mirrors Spark SQL double equality
      // (NaN = NaN is TRUE in SQL; Java != would diverge on a NaN
      // min/max pair and leak NaN into recon_mse)
      val degenerate = mx == mn || (mx.isNaN && mn.isNaN)
      if (!degenerate) {
        val step = (mx - mn) / 254.0
        code = math.floor((x - mn) / step + 0.5).toLong
        err = x - (mn + code.toDouble * step)
      }
      qSum += code
      qDot += code * (i + 1)
      se += err * err
      i += 1
    }
    InternalRow(qSum, qDot, se / n.toDouble)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object EmbedQuantStats {
  /** Column form: vec an array<float|double>, mns/mxs array<double>. */
  def of(vec: Column, mns: Column, mxs: Column): Column =
    GraftColumnBridge.column(EmbedQuantStats(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(mns),
      GraftColumnBridge.expression(mxs)))
}
