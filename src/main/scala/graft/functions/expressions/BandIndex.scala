package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** graft_band_index(value, lower_bounds, upper_bounds): index of the
  * half-open interval [lower(i), upper(i)) containing `value`, or null.
  *
  * The interval table must be sorted by lower bound and
  * non-overlapping — exactly the shape of scida's halo (offset,
  * length) catalogs (reference: src/scida/customs/arepo/dataset.py:312
  * `add_catalogIDs`), where catalogs reach 1e6–1e7 intervals. A
  * broadcast range JOIN evaluates O(B) band predicates per row (and a
  * nested-loop join materializes the pair stream); this expression
  * binary-searches the broadcast bounds in O(log B) per row inside
  * whole-stage codegen, with no join operator at all.
  */
case class BandIndex(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def prettyName: String = "graft_band_index"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == DoubleType &&
      Seq(second, third).forall(_.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, array<double>, array<double>)")
  }

  override def nullSafeEval(v: Any, loAny: Any, hiAny: Any): Any = {
    val x = v.asInstanceOf[Double]
    val lo = loAny.asInstanceOf[ArrayData]
    val hi = hiAny.asInstanceOf[ArrayData]
    var l = 0
    var r = lo.numElements() - 1
    var ans = -1
    while (l <= r) { // greatest i with lo[i] <= x
      val m = (l + r) >>> 1
      if (lo.getDouble(m) <= x) { ans = m; l = m + 1 } else r = m - 1
    }
    if (ans >= 0 && x < hi.getDouble(ans)) ans else null
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, hi) => {
      val l = ctx.freshName("l"); val r = ctx.freshName("r")
      val m = ctx.freshName("m"); val ans = ctx.freshName("ans")
      s"""
        |int $l = 0;
        |int $r = $lo.numElements() - 1;
        |int $ans = -1;
        |while ($l <= $r) {
        |  int $m = ($l + $r) >>> 1;
        |  if ($lo.getDouble($m) <= $v) { $ans = $m; $l = $m + 1; }
        |  else { $r = $m - 1; }
        |}
        |if ($ans >= 0 && $v < $hi.getDouble($ans)) { ${ev.value} = $ans; }
        |else { ${ev.isNull} = true; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
