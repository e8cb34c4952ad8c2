package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
  * third member of the sketch family next to HLL distinct and
  * mergeable quantiles: answer "how often does key X occur?" for any
  * later-chosen key from ONE streaming pass over the data, in
  * O(1/eps · ln 1/δ) space, without a per-key groupBy.
  *
  * Scale posture: Spark's `stat.countMinSketch` builds per-partition
  * sketches map-side and tree-merges them to the driver — the merge
  * cost is the (tiny, fixed-size) sketch, never the data. The sketch
  * then rides back broadcast for point estimates over any key frame
  * (a watchlist join without the watchlist join). Estimates are
  * one-sided: never below the true count, above it by at most
  * eps·N with probability 1−δ.
  */
object FrequencySketch {

  /** Estimated occurrence counts of `keys` (single LONG column) in
    * `df`'s `keyCol`, from one pass + a broadcast sketch. Fixed seed:
    * estimates are reproducible across runs and partitionings. */
  def estimateCounts(df: DataFrame, keyCol: String, keys: DataFrame,
      eps: Double = 0.0001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val cms = df.stat.countMinSketch(col(keyCol), eps, confidence, seed)
    val spark = df.sparkSession
    val b = spark.sparkContext.broadcast(cms)
    val kc = keys.columns.head
    // native codegen'd probe over the broadcast sketch (no ScalaUDF)
    keys.select(col(kc).cast("long").as(kc))
      .withColumn("est_cnt",
        graft.functions.expressions.SketchProbes.cmEstimate(col(kc), b))
  }
}
