package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming vector ingest — the arrival-time half of the LSM index
  * story (`ann_delta_search` serves fresh vectors brute-force;
  * `Ivf.compact` folds them into the pruned layout; this runs that
  * fold INCREMENTALLY as vectors arrive).
  *
  * State posture: STATELESS. A vector's cell is a pure function of
  * its embedding and the (plan-literal) quantizer — no state store,
  * no watermark, and replay-invariance for free: a vector lands in
  * the same cell whether it arrives in one batch, many micro-batches,
  * or a backfill. The only cross-batch artifact is the appended cell
  * layout itself, which is exactly the batch `Ivf.compact` contract
  * (append touches only the arriving vectors' cell directories).
  */
object VectorStreams {

  /** Stateless cell assignment: the same codegen'd argmin pass batch
    * compaction uses, applied per micro-batch. */
  def cellAssign(vecs: DataFrame, centers: Array[Array[Double]],
      vec: String = "embedding"): DataFrame = {
    val centLit = typedLit(centers.map(_.toSeq).toSeq)
    vecs.withColumn("cell",
      call_function("graft_nearest_centroid", col(vec), centLit))
  }

  /** Ingest a vector stream into the cell-partitioned at-rest index:
    * each micro-batch is one `Ivf.compact` append (only the batch's
    * cell directories are touched). Radius-statistic maintenance is
    * the caller's compaction-time concern (`Ivf.cellRadiiMerge` per
    * batch, or once per compaction window) — a searcher that unions
    * the un-folded tail brute-force (`ann_delta_search`'s shape)
    * needs no statistic for it at all. */
  def ingest(vecs: DataFrame, centers: Array[Array[Double]],
      path: String, vec: String = "embedding",
      checkpoint: String): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ann.Ivf.compact(batch, centers, vec, path); ()
      }
      .start()
}
