package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** graft_nearest_cells(vec, centroids, p): indices of the `p`
  * squared-L2 nearest centroids, nearest first (ties to the lowest
  * index) — the MULTI-PROBE generalization of graft_nearest_centroid.
  *
  * Multi-probe assignment is the blocking key for cell-blocked
  * near-dup detection (dedup_embcos): vectors near a cell boundary
  * land in each of their `p` closest cells, so boundary-spanning
  * near-dup pairs still share a block. Same execution shape as the
  * single-cell form: centroids ride as one plan literal, assignment is
  * a codegen'd double loop per row — no ML pipeline, no join.
  */
case class NearestCells(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def prettyName: String = "graft_nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat = first.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val pOk = third.dataType == IntegerType && third.foldable
    if (vecOk && centOk && pOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<double>>, int literal)")
  }

  override protected def nullSafeEval(vec: Any, cents: Any, p: Any): Any =
    NearestCells.compute(vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], p.asInstanceOf[Int], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, p) =>
      s"graft.functions.expressions.NearestCells.compute($v, $c, $p, $isFloat)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object NearestCells {

  def compute(vec: ArrayData, cents: ArrayData, p: Int,
      isFloat: Boolean): ArrayData = {
    val d = vec.numElements()
    val k = cents.numElements()
    val take = math.min(math.max(p, 1), k)
    val dist = new Array[Double](k)
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
      dist(i) = s
      i += 1
    }
    // selection of the `take` smallest — k is tens-of-cells small, so
    // an O(k·p) partial selection beats sorting machinery
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var t = 0
    while (t < take) {
      // seed with the first unused index instead of a MaxValue
      // sentinel: a NaN/+Inf distance (corrupt vector, overflowed
      // norm) never wins a `<` comparison, and an all-NaN row would
      // leave a sentinel-seeded `best` at -1 and crash — seeded, such
      // rows deterministically take the lowest-index unused cells
      var best = -1
      var bestD = 0.0
      var m = 0
      while (m < k) {
        if (!used(m) && (best == -1 || dist(m) < bestD)) {
          bestD = dist(m); best = m
        }
        m += 1
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }
}
