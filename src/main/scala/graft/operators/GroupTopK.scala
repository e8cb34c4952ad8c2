package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k rows (scida's "k most massive particles per halo"
  * pattern, reference: src/scida/customs/arepo/dataset.py:789 chained
  * grouped ops; also the classic heavy-row selection).
  *
  * A bare `row_number().over(Window.partitionBy(group))` shuffles the
  * ENTIRE table into one reducer per group — with a handful of groups
  * that is a handful of tasks no matter the cluster size, the
  * canonical scale bug. Here the algebraic two-phase form:
  *
  *   1. map-side reduction: sort WITHIN each input partition (local
  *      sort, no exchange) and stream-filter the first k rows per
  *      group — any global top-k row is necessarily in its
  *      partition's local top-k. Survivors <= partitions * groups * k.
  *   2. exact window over the tiny survivor set.
  *
  * The only exchange is the survivors' — bytes shrink from O(table)
  * to O(partitions * groups * k), the same shape partial aggregation
  * gives groupBy.
  */
object GroupTopK {

  /** Top `k` rows per `groupCols` group under `orderCols` (pass desc/
    * asc Columns). Appends rank column `rkName` (1-based). */
  def topK(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      k: Int, rkName: String = "rk"): DataFrame = {
    val sorted = df.sortWithinPartitions(groupCols.map(col) ++ orderCols: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val survivors = sorted.mapPartitions { it =>
      // rows arrive grouped (partition-locally) by the group columns:
      // keep a counter per group run
      var cur: Seq[Any] = null
      var n = 0
      it.filter { r =>
        val key = gIdx.map(r.get)
        if (key != cur) { cur = key; n = 0 }
        n += 1
        n <= k
      }
    }(Encoders.row(schema))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    survivors.withColumn(rkName, row_number().over(w))
      .filter(col(rkName) <= k)
  }
}
