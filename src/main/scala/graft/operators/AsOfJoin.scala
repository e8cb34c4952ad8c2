package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time as-of join: for each left row, attach the latest right row
  * with the same key and time <= left time.
  *
  * Spark lacks a native as-of join, so this composes one Spark-first
  * (SURVEY.md §2 `asof_join`): tag and union both sides, sort within
  * each key by (time, side) with the right side first on ties
  * (inclusive as-of), and carry the right side's payload forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding window.
  *
  * Scale posture: ONE shuffle, on the key (the window partition); no
  * join explosion, no range-condition nested loop. Skewed keys are
  * handled by AQE; the window is rows-unbounded-preceding so Spark
  * streams it without buffering whole partitions.
  */
object AsOfJoin {

  /** @param left  rows to enrich; must contain `key` and `time`
    * @param right rows providing `payload` columns; must contain
    *              `key`, `time`, and `payload`
    * @return left rows + `payload` columns as-of left.time (inclusive),
    *         null when no prior right row exists */
  def asof(left: DataFrame, right: DataFrame,
      key: String, time: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // side=0 sorts right rows before left rows at equal times → a
    // right row at exactly left.time is visible (inclusive as-of).
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(key), col(time), struct(payload.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    val unioned = l.withColumn("__p", lit(null).cast(r.schema("__p").dataType))
      .select((leftCols.map(col) :+ col("__side") :+ col("__p")): _*)
      .unionByName(r, allowMissingColumns = true)
    // final tie-break on the payload's string form: multiple right
    // rows at the same (key, time) would otherwise resolve by shuffle
    // order — run-to-run nondeterminism the oracle hash would catch
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__side"), col("__p").cast("string"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__asof.$p").as(p)): _*)
  }
}
