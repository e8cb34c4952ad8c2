package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** graft_nearest_centroid(vec, centroids): index of the squared-L2
  * nearest centroid (ties to the lowest index).
  *
  * The IVF coarse-quantizer assignment step (reference pattern:
  * FAISS-style inverted files; scida has no ANN surface — this serves
  * SURVEY §2's similarity-search rows): centroids arrive as ONE
  * literal array-of-arrays (broadcast in the plan, k × dims doubles),
  * and assignment is a codegen'd double loop per row — no ML pipeline
  * stages, no vector UDT conversion, no join.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_nearest_centroid"
  override def dataType: DataType = IntegerType

  private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && centOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<double>>)")
  }

  override protected def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCentroid.compute(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.expressions.NearestCentroid.compute($v, $c, $isFloat)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object NearestCentroid {

  def compute(vec: ArrayData, cents: ArrayData, isFloat: Boolean): Int = {
    val d = vec.numElements()
    val k = cents.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var i = 0
    while (i < k) {
      val c = cents.getArray(i)
      var s = 0.0
      var j = 0
      while (j < d) {
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        val diff = x - c.getDouble(j)
        s += diff * diff
        j += 1
      }
      if (s < bestD) { bestD = s; best = i }
      i += 1
    }
    best
  }
}
