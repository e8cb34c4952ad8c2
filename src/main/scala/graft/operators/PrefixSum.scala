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
  * Here the classic two-phase scan, expressed as ONE Spark action:
  *
  *   1. range-partition by key (`repartitionByRange` — Spark's own
  *      RangePartitioner sampling picks the boundaries; ordered,
  *      deterministically seeded, and its sample job runs inside the
  *      consuming action, not as a separate driver call),
  *   2. cumulative sum WITHIN each range partition in parallel
  *      (window partitioned by `spark_partition_id()`),
  *   3. per-partition totals (<= `buckets` rows after a map-side-
  *      combined aggregate) get their exclusive scan through a
  *      single-task window — bounded by the bucket count, never the
  *      data — and flow back as a BROADCAST join, still inside the
  *      same plan.
  *
  * Earlier revisions drove steps 1 and 3 as separate driver actions
  * (`approxQuantile` + `collect`); folding them into the consumer's
  * plan removes two driver round-trips per call — the dominant cost
  * at bench scale, and two fewer synchronization barriers at any
  * scale.
  */
object PrefixSum {

  /** Adds `outCol` = exclusive prefix sum of `len` in ascending
    * numeric-`key` order. Keys must be unique (one row per group, as
    * in an offset catalog). */
  def exclusive(dfIn: DataFrame, key: String, len: Column, buckets: Int,
      outCol: String = "offset"): DataFrame = {
    // The ranged frame feeds two consumers (in-partition cumsum, the
    // totals subtree) — materialize it once so both see the SAME
    // partitioning (spark_partition_id is only meaningful against a
    // frozen layout; at 100 TB this is "write the bucketed catalog
    // once", the move scida also makes). CacheScope-tracked: the
    // harness unpersists after the consuming query's action.
    val ranged = graft.CacheScope.track(
      dfIn.repartitionByRange(buckets, col(key)).withColumn("__b", spark_partition_id()))
    val inBucket = Window.partitionBy("__b").orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ranged.withColumn("__cum", sum(len).over(inBucket))
    // exclusive scan over the per-bucket totals: the single-task
    // window touches <= `buckets` rows, and sum(len)'s type (long for
    // counts) carries through — no double round-trip (2^53 hazard)
    val overBuckets = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = ranged.groupBy("__b").agg(sum(len).as("__tot"))
      .select(col("__b"), coalesce(
        sum(col("__tot")).over(overBuckets), lit(0L).cast("long")).as("__pre"))
    cum.join(broadcast(pre), Seq("__b"))
      .withColumn(outCol, col("__pre") + col("__cum") - len)
      .drop("__b", "__cum", "__pre")
  }
}
