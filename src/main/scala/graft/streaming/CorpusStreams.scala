package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Streaming duals of the corpus-hygiene operators (SURVEY.md §2
  * "LLM-data-pipeline"): the same declarative cleaning plan the batch
  * pipeline runs (`pipeline_clean`), executed incrementally over a
  * document stream — the shape of a crawl-ingest front end, where
  * cleaning at arrival time is what keeps the data lake from
  * accumulating junk that every downstream batch job would re-filter.
  *
  * State posture: the quality gate, language filter, and token
  * counting are STATELESS (map-side per micro-batch, no state store
  * at all). Only content dedup keeps state — one entry per distinct
  * content hash inside the watermark horizon, expired by the engine,
  * so memory is bounded by arrival rate × horizon, not stream
  * length. (Corpus-wide exact dedup against ALL history belongs to
  * the batch increment — `Dedup.incrementalKeep` against the
  * persisted hash set; the stream stage removes the near-in-time
  * duplicates that dominate crawl traffic.)
  */
object CorpusStreams {

  /** Stateless quality gate: Gopher-style bounds + language allowlist.
    * Identical semantics to the batch `quality_filter`/`pipeline_clean`
    * stages — one codegen'd filter per micro-batch. */
  def qualityGate(docs: DataFrame, textCol: String = "text",
      langs: Seq[String] = Seq("en")): DataFrame = {
    val t = col(textCol)
    docs.filter(TextOps.gopherFilter(t) &&
      TextOps.langId(t).isin(langs: _*))
  }

  /** Content dedup: drop documents whose exact TEXT HASH was already
    * seen — first occurrence wins. On a STREAM, "seen" is bounded by
    * the watermark horizon (dropDuplicatesWithinWatermark state, one
    * entry per in-horizon hash); on a BATCH frame the same plan
    * replays deterministically as keep-the-min-`tsCol`-row (what
    * first-arrival means when arrival follows event time) — this is
    * what the batch/stream equivalence spec pins. Adds the hash
    * column so downstream stages can reuse it without re-hashing. */
  def contentDedup(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermarkDelay: String = "1 hour",
      idCol: String = "doc_id"): DataFrame = {
    val hashed = docs.withColumn("content_hash", TextOps.exactHash(col(textCol)))
    if (hashed.isStreaming)
      hashed.withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("content_hash")
    else {
      // tie-break by id: two same-hash rows at the SAME timestamp must
      // resolve identically across runs/partitionings — orderBy(ts)
      // alone leaves the winner to shuffle order
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("content_hash").orderBy(col(tsCol), col(idCol))
      hashed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** The full ingest pipeline: gate → in-horizon dedup → token
    * counts. One lazy plan; runs identically on a batch frame (minus
    * the watermark state bound) — the batch/stream-equivalence spec
    * pins that. */
  def cleanIngest(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermarkDelay: String = "1 hour",
      langs: Seq[String] = Seq("en")): DataFrame =
    contentDedup(qualityGate(docs, textCol, langs), textCol, tsCol, watermarkDelay)
      .withColumn("ws_tokens", TextOps.wsTokenCount(col(textCol)))
      .withColumn("bpe_tokens", TextOps.bpeishTokenCount(col(textCol)))
}
