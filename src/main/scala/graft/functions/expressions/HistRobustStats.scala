package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** graft_hist_robust_stats(hist): robust location/scale statistics of
  * a weighted value histogram — input array<struct<v:long, c:long>>
  * (any order), output struct(n, med, mad, outliers):
  *
  *   - n    = Σ c (total weight)
  *   - med  = weighted discrete median: smallest v with
  *            2·cum(v) >= n + n mod 2
  *   - mad  = the same discrete median of |v − med| over the folded
  *            deviation histogram
  *   - outliers = Σ c where |v − med| > 3·mad
  *
  * The anomaly_zscore hot path: one tight two-sort loop per GROUP
  * row replaces four interpreted higher-order folds + two sort_array
  * passes over ~50k-element arrays (HOFs never codegen and allocate
  * a struct row per element per fold). The rule is bit-identical to
  * the fold form — all-integer, no ties to drift.
  */
case class HistRobustStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_hist_robust_stats"

  // an EMPTY histogram array yields null (there is no median of
  // nothing) even when the child itself is non-nullable — e.g. a
  // collect_list whose every element was filtered out
  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("med", LongType, nullable = false),
    StructField("mad", LongType, nullable = false),
    StructField("outliers", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    val vs = new Array[Long](m)
    val cs = new Array[Long](m)
    var i = 0
    var n = 0L
    while (i < m) {
      val row = arr.getStruct(i, 2)
      vs(i) = row.getLong(0)
      cs(i) = row.getLong(1)
      n += cs(i)
      i += 1
    }
    val idx = Array.range(0, m)
    // sort indices by value (histogram entries arrive unordered from
    // collect_list); boxed comparator on <=bounded-cardinality arrays
    val byV = idx.map(Integer.valueOf).sortWith((a, b) => vs(a) < vs(b))
    val thresh = n + (n % 2) // 2*cum >= n + n mod 2
    def medianOf(order: Array[Integer], value: Int => Long): Long = {
      var cum = 0L
      var j = 0
      while (j < m) {
        cum += cs(order(j))
        if (2 * cum >= thresh) return value(order(j))
        j += 1
      }
      value(order(m - 1))
    }
    val med = medianOf(byV, o => vs(o))
    val dev = new Array[Long](m)
    i = 0
    while (i < m) { dev(i) = math.abs(vs(i) - med); i += 1 }
    val byDev = idx.map(Integer.valueOf).sortWith((a, b) => dev(a) < dev(b))
    val mad = medianOf(byDev, o => dev(o))
    var outliers = 0L
    i = 0
    while (i < m) { if (dev(i) > 3 * mad) outliers += cs(i); i += 1 }
    InternalRow(n, med, mad, outliers)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HistRobustStats {
  /** Column form over an array<struct<v,c>> histogram column. */
  def of(h: Column): Column =
    GraftColumnBridge.column(HistRobustStats(GraftColumnBridge.expression(h)))
}
