package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming runtime for the event surface (SURVEY.md §2
  * "Event/stream ops"): the streaming duals of EventQueries'
  * batch operators.
  *
  * scida has no streaming surface; a 100 TB training-data pipeline
  * does — ingest dedup, windowed quality stats, sessionized logs. The
  * same declarative plan runs incrementally: watermarks bound state,
  * windowed aggregation state is per (window, type) — O(active
  * windows), not O(events) — and sessionization keeps one small state
  * record per active key with an event-time timeout.
  */
object EventStreams {

  /** Tumbling-window counts/sums with a watermark bounding state.
    * Works on any streaming (or batch) frame with (ts: timestamp,
    * event_type: string, value: double). */
  def windowedAgg(events: DataFrame,
      windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming ingest dedup: drop repeated ids within the watermark
    * horizon — the stream-side twin of Dedup.exactGroups. State is one
    * entry per id seen inside the watermark window; expired state is
    * dropped by the engine, so memory is bounded by arrival rate ×
    * horizon, not stream length. */
  def streamingDedup(events: DataFrame, idCol: String,
      tsCol: String = "ts", watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream enrichment against a static dimension: stream-static join
    * broadcasts the dim to every micro-batch — no streaming state at
    * all, the streaming twin of the batch broadcast dim join. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  /** Streaming anomaly gate — the ONLINE half of the batch
    * `anomaly_zscore` query: robust per-key (median, MAD) statistics
    * are a BATCH artifact (maintained by the offline pipeline, rows
    * (key, med_c, mad_c) in integer cents), broadcast onto the stream,
    * and each arriving event flags as anomalous iff
    * |cents(value) − med| > 3·MAD. Stateless (no watermark, no state
    * store): a row's verdict is a pure function of (row, stats), so
    * the admitted set is identical across batch, micro-batched
    * arrival, and replay — same backfill-safety argument as the
    * sampling/decontamination gates. Keys absent from the stats table
    * pass un-flagged (left join): a brand-new event type must not be
    * silently dropped by a stale model. */
  def anomalyGate(events: DataFrame, stats: DataFrame,
      key: String = "event_type", valueCol: String = "value"): DataFrame = {
    val vc = floor(col(valueCol) * 100 + 0.5).cast("long")
    events
      .join(broadcast(stats), Seq(key), "left")
      .withColumn("is_anomaly",
        coalesce(abs(vc - col("med_c")) > col("mad_c") * 3, lit(false)))
  }

  /** Stream-stream INTERVAL join: match each event with responses for
    * the same key arriving within [0, horizon) after it. Both sides
    * are watermarked so the engine can discard buffered rows once no
    * counterpart can still arrive — state is bounded by rate ×
    * (watermark + horizon), not stream length. Event columns:
    * (key, ts); response columns: (key, r_ts, ...). */
  def intervalJoin(events: DataFrame, responses: DataFrame, key: String,
      horizon: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val l = events.withWatermark("ts", watermarkDelay)
    val r = responses.withWatermark("r_ts", watermarkDelay)
    l.join(r,
      l(key) === r(key) &&
        col("r_ts") >= col("ts") &&
        col("r_ts") < col("ts") + expr(s"INTERVAL $horizon"))
      .drop(r(key))
  }

  final case class Evt(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, t_start: Long, t_end: Long,
      n_events: Long, value_sum: Double)

  /** True unbounded sessionization with per-key state. Sessions close
    * two ways: (a) exactly, by event-time gap, when a later event for
    * the key arrives >= gapUs after the last one; (b) approximately,
    * by a processing-time timeout sized to the same gap, for keys that
    * simply stop sending (an event-time-precise close would need a
    * watermark; the timeout approximates it under the assumption that
    * processing time roughly tracks event time for a live stream).
    * State per active key is one 4-field record — bounded by
    * concurrently-active users, not by history. */
  def sessionize(events: Dataset[Evt], gapUs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (user, evts, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, s.start, s.last, s.n, s.sum))
          } else {
            // events within a micro-batch arrive unordered: sort the
            // (small, per-key per-batch) slice before folding
            val sorted = evts.toSeq.sortBy(_.ts_us)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.last < gapUs => // >= gap splits, like batch Sessionize
                  cur = Some(SessionState(s.start, e.ts_us, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
              }
            }
            cur.foreach(state.update)
            state.setTimeoutDuration(math.max(gapUs / 1000L, 1L)) // ms ≈ gap
            closed.reverseIterator
          }
      }
  }
}
