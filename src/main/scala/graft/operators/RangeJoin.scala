package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join.
  *
  * Spark plans a raw inequality join (`p.t BETWEEN i.start AND i.end`)
  * as a broadcast-nested-loop / cartesian — O(points × intervals),
  * a scale-killer the moment neither side broadcasts. The classic
  * fix (the "bin join" used by range-join extensions in several SQL
  * engines) turns containment into an EQUI-join on a time bucket:
  * each interval is exploded to the buckets it overlaps, each point
  * maps to exactly one bucket, and the exact predicate re-filters
  * after the hash join. Cost: intervals fan out by
  * ceil(len/bucketWidth)+1 rows, the join shuffles on
  * (key, bucket) — partition-parallel, AQE-skew-splittable, no
  * nested loop anywhere.
  *
  * `bucketWidth` should be on the order of the TYPICAL interval
  * length: much smaller explodes intervals into many buckets; much
  * larger packs unrelated rows into one bucket and shifts work onto
  * the post-join filter. Both only hurt constants, never correctness.
  *
  * Times are integral (epoch micros/nanos); `div` keeps bucket ids in
  * exact integer arithmetic (double division would round near bucket
  * edges at 1e15-scale epochs). Reference semantics: scida has no
  * interval join; this extends the event side of the engine the same
  * way AsOfJoin does (batch equivalent of the streaming interval
  * join in streaming/EventStreams.scala).
  */
object RangeJoin {

  // backquote-quote a column name for splicing into expr() — names
  // with dots/spaces parse as references, embedded backquotes double
  private def q(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Inner-join `points` to the `intervals` rows that contain them:
    * same `key`, and tCol ∈ [startCol, endCol] (inclusive ends).
    * Times must be non-negative integers in the same unit. Column
    * names must not collide across sides except `key` (a shared
    * non-key name would make the joined output ambiguous), and
    * neither side may already carry the internal `__bucket` column. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      key: String, tCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!points.columns.contains("__bucket") &&
      !intervals.columns.contains("__bucket"),
      "__bucket is reserved by pointInInterval; rename the input column")
    val shared = points.columns.toSet
      .intersect(intervals.columns.toSet) - key
    require(shared.isEmpty,
      s"non-key columns collide across sides (ambiguous after join): " +
        shared.toSeq.sorted.mkString(", "))
    // every column reference goes through q(): bare col(name) PARSES
    // the name (dots become struct access, an embedded backquote is a
    // syntax error); the quoted form always resolves the literal name
    val p = points.withColumn("__bucket",
      expr(s"${q(tCol)} div ${bucketWidth}L"))
    val i = intervals.withColumn("__bucket", explode(sequence(
      expr(s"${q(startCol)} div ${bucketWidth}L"),
      expr(s"${q(endCol)} div ${bucketWidth}L"))))
    p.join(i, Seq(key, "__bucket"))
      .filter(col(q(tCol)) >= col(q(startCol)) && col(q(tCol)) <= col(q(endCol)))
      .drop("__bucket")
  }
}
