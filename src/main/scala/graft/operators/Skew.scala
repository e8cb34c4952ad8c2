package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable skew-safe join (the technique the `salted_join` query
  * demonstrates inline, packaged as an operator): detect hot keys,
  * salt ONLY the hot fact rows across `nSalt` buckets, replicate ONLY
  * the hot build rows — uniform full-side replication is the 100 TB
  * anti-pattern. Detection: integral keys take ONE bounded-state
  * map-side pass (FrequencySketch.heavyHitters — no sample job, no
  * shuffle, hot set bounded ≤ its broadcast budget by construction)
  * under the φ-fraction contract (hot = ≥1/256 of fact rows;
  * `hotThreshold` does not apply to this path); other key types fall
  * back to a seeded-sample aggregate, where `hotThreshold` is the
  * minimum SAMPLED count. Both join
  * branches read the hot-key set from one immutable literal/persisted
  * plan, so they cannot disagree on the set; correctness does not
  * depend on WHICH keys are called hot — any set yields the same join
  * output — only on both sides agreeing.
  *
  * (AQE's runtime skew-join split, on in GraftSession, handles
  * transient skew; this is the explicit form for known/persistent
  * skew, and composes with any post-join logic.)
  */
object Skew {

  def saltedJoin(fact: DataFrame, factKey: String,
      build: DataFrame, buildKey: String,
      nSalt: Int = 8, hotThreshold: Long = 2,
      sampleFraction: Double = 0.125, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val spark = fact.sparkSession
    import spark.implicits._
    val integralKey = fact.schema(factKey).dataType match {
      case LongType | IntegerType => true
      case _ => false
    }
    val hot: DataFrame = if (integralKey) {
      // phi-fraction contract, NOT the absolute `hotThreshold`: an
      // absolute count threshold against full counts marks nearly
      // every repeated key hot (threshold 2 on TPC-H lineitem ≈ all
      // keys, trimmed arbitrarily at the summary capacity — uniform
      // replication, the exact anti-pattern this operator exists to
      // avoid). Hot = holds >= 1/256 of the fact rows; what overflows
      // a reducer is a FRACTION of the table, not a fixed count.
      FrequencySketch.heavyHitters(fact.select(factKey), factKey,
        capacity = 1 << 16, minFraction = 1.0 / 256)
        .toSeq.toDF("__hotkey")
    } else graft.CacheScope.track(
      fact.sample(withReplacement = false, sampleFraction, seed)
        .groupBy(factKey).agg(count(lit(1)).as("__cnt"))
        .filter(col("__cnt") >= hotThreshold)
        .select(col(factKey).as("__hotkey")))
    // the salt must VARY across rows of one hot key (a key-derived
    // hash would put the whole hot key in one bucket); any per-row
    // value works because the build side is replicated to every salt
    val saltedFact = fact
      .join(broadcast(hot), col(factKey) === col("__hotkey"), "left")
      .withColumn("__salt", when(col("__hotkey").isNotNull,
        pmod(monotonically_increasing_id(), lit(nSalt)).cast("int"))
        .otherwise(lit(0)))
      .drop("__hotkey")
    val saltedBuild = build
      .join(broadcast(hot), col(buildKey) === col("__hotkey"), "left")
      .withColumn("__salt", explode(when(col("__hotkey").isNotNull,
        sequence(lit(0), lit(nSalt - 1))).otherwise(array(lit(0)))))
      .drop("__hotkey")
    saltedFact.join(saltedBuild,
      saltedFact(factKey) === saltedBuild(buildKey) &&
        saltedFact("__salt") === saltedBuild("__salt"))
      .drop("__salt")
  }
}
