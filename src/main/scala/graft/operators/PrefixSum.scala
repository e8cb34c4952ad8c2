package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-out exclusive prefix sum (the offset-table primitive behind
  * scida's `get_groupoffsets`, reference: src/scida/customs/arepo/
  * dataset.py:592).
  *
  * A single `Window.orderBy(key)` computes this but serializes the
  * whole table into ONE task ("WindowExec: No Partition Defined").
  * Here the classic two-phase scan: range-bucket rows by key (quantile
  * boundaries → native binary-search band lookup, no join), cumulative
  * sum WITHIN each bucket in parallel, then add each bucket's
  * broadcast prefix (sum of all earlier buckets) back map-side. The
  * only non-parallel step touches the `buckets`-row totals table.
  */
object PrefixSum {

  /** Adds `outCol` = exclusive prefix sum of `len` in ascending
    * numeric-`key` order. Keys must be unique (one row per group, as
    * in an offset catalog). */
  def exclusive(dfIn: DataFrame, key: String, len: Column, buckets: Int,
      outCol: String = "offset"): DataFrame = {
    // the catalog feeds three scans (quantile sampling, in-bucket
    // cumsum, bucket totals) — materialize it once; at 100 TB this is
    // "write the offset catalog out once", the move scida also makes.
    // CacheScope-tracked: the harness unpersists after the consuming
    // query's action, so repeated invocations don't leak storage.
    val df = graft.CacheScope.track(dfIn)
    // quantile boundaries: a tiny driver-side array (same role as
    // RangePartitioner's sample), deterministic given the data
    // relative error 0.02: boundaries only balance bucket LOAD (the
    // sum is exact regardless), and a loose t-digest pass is
    // measurably cheaper than a tight one
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = df.stat
      .approxQuantile(key, probs, 0.02).distinct.sorted
    val bucketed =
      if (bounds.isEmpty) df.withColumn("__b", lit(0))
      else {
        val los = array((Double.MinValue +: bounds).map(lit(_)): _*)
        val his = array((bounds :+ Double.MaxValue).map(lit(_)): _*)
        df.withColumn("__b",
          call_function("graft_band_index", col(key).cast("double"), los, his))
      }
    val inBucket = Window.partitionBy("__b").orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.withColumn("__cum", sum(len).over(inBucket))
    // per-bucket totals: <= `buckets` rows after a map-side-combined
    // aggregate — collect them to the driver and inline the exclusive
    // bucket prefix as ONE literal-array lookup. This replaces the
    // former triangular self-join + broadcast hash join (two extra
    // stages) with a codegen'd element_at; the collected frame is
    // bounded by the bucket count, never the data.
    val totals = bucketed.groupBy("__b").agg(sum(len).as("__tot")).collect()
    if (totals.isEmpty)
      return cum.withColumn(outCol, col("__cum") - len).drop("__b", "__cum")
    // exclusive scan over bucket totals, typed to match sum(len) so
    // long counts never round-trip through double (2^53 hazard)
    val preCol = totals.head.get(1) match {
      case _: Long =>
        val byB = totals.map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        val pre = new Array[Long](byB.map(_._1).max + 1)
        var running = 0L
        byB.foreach { case (b, tot) => pre(b) = running; running += tot }
        element_at(typedLit(pre.toSeq), col("__b") + 1)
      case _ =>
        val byB = totals.map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
        val pre = new Array[Double](byB.map(_._1).max + 1)
        var running = 0.0
        byB.foreach { case (b, tot) => pre(b) = running; running += tot }
        element_at(typedLit(pre.toSeq), col("__b") + 1)
    }
    cum.withColumn(outCol, preCol + col("__cum") - len)
      .drop("__b", "__cum")
  }
}
