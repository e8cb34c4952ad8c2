package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment assignment.
  *
  * scida's `add_catalogIDs` (reference: src/scida/customs/arepo/
  * dataset.py:312) maps each particle row to its owning halo by
  * locating its index inside a (offset, length) table. Spark-first the
  * band table is a small dimension: broadcast it and range-join, so
  * the big side streams map-side with zero shuffle. For band tables
  * too large to broadcast, assign via bucketed equi-join on a
  * quantized key (`assignBucketed`).
  */
object RangeAssign {

  /** Assign each row the `band` label of the interval [lo, hi) that
    * contains `value`. Bands are broadcast (small dimension). */
  def assign(df: DataFrame, value: Column, bands: Seq[(Double, Double, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bandDf = bands.toDF("lo", "hi", "band")
    df.join(broadcast(bandDf), value >= col("lo") && value < col("hi"))
  }

  /** Join-free assignment for driver-known band tables (scida's halo
    * offset catalogs are driver-side arrays too): bands are sorted and
    * embedded as literal arrays, and `graft_band_index` (native
    * codegen'd binary search, functions/expressions/BandIndex.scala)
    * finds the containing interval in O(log B) per row — no join
    * operator, no broadcast nested loop, scales to 1e6+ intervals.
    * Bands must be non-overlapping. Rows outside every band are
    * dropped (same inner-join semantics as `assign`). */
  def assignSorted(df: DataFrame, value: Column,
      bands: Seq[(Double, Double, String)]): DataFrame = {
    val sorted = bands.sortBy(_._1)
    sorted.foreach { case (lo, hi, b) => require(lo < hi, s"empty band $b") }
    sorted.sliding(2).foreach {
      case Seq((_, hi1, b1), (lo2, _, b2)) =>
        require(hi1 <= lo2, s"overlapping bands: [$b1) ends at $hi1 after [$b2) starts at $lo2")
      case _ =>
    }
    val los = array(sorted.map(b => lit(b._1)): _*)
    val his = array(sorted.map(b => lit(b._2)): _*)
    val labels = array(sorted.map(b => lit(b._3)): _*)
    df.withColumn("__bi",
      call_function("graft_band_index", value.cast("double"), los, his))
      .filter(col("__bi").isNotNull)
      .withColumn("band", element_at(labels, col("__bi") + 1))
      .drop("__bi")
  }

  /** Scale path for many intervals: quantize `value` to a bucket of
    * `bucketWidth`, explode each band to its covered buckets, and
    * equi-join on bucket before the exact range check — turns the
    * range join into a hash join on bucket id. */
  def assignBucketed(df: DataFrame, value: Column,
      bands: DataFrame, lo: Column, hi: Column, bucketWidth: Double): DataFrame = {
    val bandBuckets = bands.withColumn("bucket",
      explode(sequence(floor(lo / bucketWidth).cast("long"),
        floor((hi - lit(1e-12)) / bucketWidth).cast("long"))))
    df.withColumn("bucket", floor(value / bucketWidth).cast("long"))
      .join(bandBuckets, Seq("bucket"))
      .filter(value >= lo && value < hi)
      .drop("bucket")
  }
}
