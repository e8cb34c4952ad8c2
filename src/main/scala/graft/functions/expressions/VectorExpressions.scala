package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulation (zip_with + aggregate) is
  * evaluated interpretively, one boxed lambda call per element; these
  * expressions generate a tight primitive Java loop via doGenCode —
  * the preferred extension mechanism when builtins can't express the
  * op efficiently (custom Expression > UDF). Registered as SQL
  * functions `graft_dot` / `graft_cosine` through
  * SparkSessionExtensions (see graft.GraftExtensions).
  *
  * Numeric contract (matches functions.VectorOps exactly, which the
  * DuckDB oracle mirrors): elements are widened to double BEFORE
  * multiply, accumulators sum strictly left-to-right, cosine =
  * dot / (sqrt(aa) * sqrt(bb)). Null element or length mismatch →
  * null (same as zip_with/aggregate null propagation).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @inline protected final def get(a: ArrayData, dt: DataType, i: Int): Double =
    dt match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  /** java accessor snippet for codegen */
  protected final def getJava(arr: String, dt: DataType, i: String): String =
    dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
}

/** graft_dot(a, b): sum_i a[i]*b[i] in double, left-to-right. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0; var s = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, lt, i) * get(b, rt, i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) { ${ev.isNull} = true; }
        |else {
        |  double $s = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $s += ${getJava(a, lt, s"$i")} * ${getJava(b, rt, s"$i")};
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $s; }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_cosine(a, b): dot/(sqrt(aa)*sqrt(bb)), all three accumulators
  * folded left-to-right in ONE pass over the arrays. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0; var xy = 0.0; var xx = 0.0; var yy = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, lt, i); val y = get(b, rt, i)
      xy += x * y; xx += x * x; yy += y * y
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) { ${ev.isNull} = true; }
        |else {
        |  double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    double $x = ${getJava(a, lt, s"$i")};
        |    double $y = ${getJava(b, rt, s"$i")};
        |    $xy += $x * $y; $xx += $x * $x; $yy += $y * $y;
        |  }
        |  if (!${ev.isNull}) {
        |    ${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
        |  }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
