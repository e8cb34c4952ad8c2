package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key with
  * inter-event gap <= `gap` belong to one session.
  *
  * Classic lag + cumulative-sum composition: a row starts a new
  * session iff it has no predecessor within `gap`; the running count
  * of session starts is the per-key session index. ONE shuffle (on
  * key); both windows share the same partitioning so Spark plans a
  * single sort+exchange. The streaming analogue (true unbounded
  * sessionization with state timeouts) lives in
  * graft.streaming.EventStreams.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per-key session index). `time` must
    * be a monotonic numeric column (e.g. epoch nanos). */
  def withSessions(df: DataFrame, key: String, time: Column, gap: Long): DataFrame = {
    // >= gap splits, matching Spark session_window's half-open window
    // (an event exactly at last + gap starts a new session)
    val order = Window.partitionBy(key).orderBy(time)
    val isNew = when(time - lag(time, 1).over(order) >= gap, 1)
      .when(lag(time, 1).over(order).isNull, 1)
      .otherwise(0)
    val run = Window.partitionBy(key).orderBy(time)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** Collapse to one row per session: bounds, event count, value sum. */
  def sessions(df: DataFrame, key: String, time: Column, gap: Long,
      valueCol: Column): DataFrame =
    withSessions(df, key, time, gap)
      .groupBy(col(key), col("session_seq"))
      .agg(
        min(time).as("t_start"),
        max(time).as("t_end"),
        count(lit(1)).as("n_events"),
        sum(valueCol).as("value_sum"))
}
