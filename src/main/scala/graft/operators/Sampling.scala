package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for data mixing: every training-data
  * pipeline ends by drawing per-stratum fractions (per language, per
  * source, per quality band) to hit a target mixture. Random sampling
  * is non-reproducible across retries and partitionings; here
  * membership is a pure function of the row's id — hash the id, keep
  * the row iff the hash's first byte falls below the stratum's
  * threshold. Map-side only, no shuffle, stable under re-partitioning
  * and incremental re-runs (a doc's fate never changes as the corpus
  * grows — the property CCNet-style pipelines rely on).
  */
object Sampling {

  /** Two-lowercase-hex-digit threshold for a rate in [0,1]: rows keep
    * iff substr(md5(id),1,2) < threshold, giving floor(rate*256)/256
    * of the hash space. */
  private def hexThreshold(rate: Double): Option[String] = {
    val n = math.floor(rate * 256).toInt
    if (n >= 256) None else Some(f"$n%02x")
  }

  /** Keep-predicate for a stratified hash sample: `rates` maps stratum
    * value → keep fraction; absent strata keep everything. */
  def stratifiedKeep(idCol: Column, stratum: Column,
      rates: Map[String, Double]): Column = {
    val key = substring(md5(idCol.cast("string")), 1, 2)
    rates.foldLeft(lit(true)) { case (acc, (value, rate)) =>
      hexThreshold(rate) match {
        case Some(t) => when(stratum === value, key < lit(t)).otherwise(acc)
        case None    => when(stratum === value, lit(true)).otherwise(acc)
      }
    }
  }

  /** The sampled frame itself. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double]): DataFrame =
    df.filter(stratifiedKeep(col(idCol), col(stratumCol), rates))
}
