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

  /** Stateless mixture-sampling gate: the deterministic md5-threshold
    * sampler (`Sampling.stratifiedKeep` — same rule as the batch
    * `sample_mix`) applied per micro-batch. A row's fate is a pure
    * function of its id, so the admitted set is identical whether the
    * corpus arrives as one batch, many micro-batches, or a replay —
    * no state, no watermark, the property that makes stream-side
    * mixing safe (a doc admitted today is admitted on backfill). */
  def sampleGate(docs: DataFrame, idCol: String = "doc_id",
      stratumCol: String = "lang",
      rates: Map[String, Double] = Map.empty): DataFrame =
    docs.filter(graft.operators.Sampling.stratifiedKeep(
      col(idCol), col(stratumCol), rates))

  /** Stateless decontamination gate: the batch `decontaminate` rule —
    * drop any doc sharing a k-shingle with the eval set — applied per
    * micro-batch. The eval set is tiny by definition (benchmark
    * prompts/answers) and rides the plan as ONE broadcast-style array
    * literal; the verdict is a map-side `arrays_overlap` over the
    * doc's native shingle array, so the stream stays stateless and
    * arrival-invariant — a doc's verdict never depends on what else
    * has arrived, and batch replay admits the identical set. */
  def decontaminationGate(docs: DataFrame, evalShingles: Seq[String],
      textCol: String = "text", k: Int = 3): DataFrame =
    docs.filter(!arrays_overlap(
      graft.functions.Hashing.shingles(col(textCol), k),
      lit(evalShingles.toArray)))

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

  /** One per-band row of a document's SimHash: `key` is the 16-bit
    * band value, `band` its index — a doc emits 4 such rows. */
  final case class BandRow(doc_id: Long, ts_ms: Long, band: Int,
      key: Int, sim: Long)

  /** BandRow + the watermarked event-time column: the analyzer
    * requires the watermark COLUMN itself to reach the stateful
    * operator's input for event-time timeouts, so it rides along. */
  final case class BandRowT(doc_id: Long, ts_ms: Long, band: Int,
      key: Int, sim: Long, evt: java.sql.Timestamp)

  /** Per-band verdict: did ANY earlier in-horizon doc in this band
    * bucket sit within the Hamming bound of this doc? */
  final case class BandVerdict(doc_id: Long, ts_ms: Long,
      prior_match: Boolean)

  final case class BandState(entries: List[(Long, Long, Long)]) // (sim, ts_ms, doc_id)

  /** Streaming NEAR-duplicate gate, stage 1 of 2: SimHash-band keyed
    * stateful verdicts. Near-dup semantics are the batch
    * `dedup_simhash` family's: two docs are near-dups when their
    * 64-bit SimHashes sit within `maxHamming`; for maxHamming <= 3
    * the 4×16-bit band pigeonhole guarantees near-dups share at
    * least one exact band, so keying state by (band, key) sees every
    * near-dup pair in some group while state stays sharded across
    * O(distinct band values) keys — never one global table.
    *
    * Each group's state holds the (sim, ts) of in-horizon arrivals
    * for that band value; `tsCol` must be epoch MILLIS. The horizon
    * is event-time end to end: a watermark of `horizonMs` bounds the
    * state (entries older than `watermark - horizonMs` can never
    * match a still-admissible row — admitted rows have ts >= wm, and
    * an entry within horizon of such a row has t >= wm - horizon —
    * and are pruned), and quiet buckets expire
    * wholesale via an EVENT-time timeout — chosen over
    * processing-time both for semantics and because processing-time
    * timeouts keep the stream perpetually "not caught up"
    * (`processAllAvailable` hangs; see ModelStreamingSpec's
    * sessionize note). State is bounded by arrival rate × horizon,
    * like contentDedup's engine state. A doc's sim enters state
    * whether or not the doc survives (crawl dedup keeps all seen
    * signatures: a chain d1~d2~d3 must drop d3 even though d2 was
    * dropped).
    *
    * Verdicts from a doc's 4 bands are merged by `mergeVerdicts` —
    * a STATELESS per-micro-batch groupBy (run it inside foreachBatch
    * or on the verdict frame of a batch replay): chaining a second
    * stateful operator after flatMapGroupsWithState is the one shape
    * Structured Streaming does not support, and the merge needs no
    * state — a doc's band rows always share a micro-batch. */
  def nearDupBandVerdicts(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", idCol: String = "doc_id",
      maxHamming: Int = 3, horizonMs: Long = 3600L * 1000)
      : org.apache.spark.sql.Dataset[BandVerdict] = {
    require(maxHamming <= 3,
      "4x16-bit banding guarantees recall only for Hamming <= 3")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val simmed = graft.functions.Hashing.simhashes(
      docs.select(col(idCol), col(tsCol), split(col(textCol), " ").as("__w"))
        .withColumn("__rid", struct(col(idCol), col(tsCol)))
        .select(col("__rid"), col("__w")), "__rid", "__w")
      .select(col("__rid").getField(idCol).cast("long").as("doc_id"),
        col("__rid").getField(tsCol).cast("long").as("ts_ms"),
        col("sim"))
    val bands = simmed.as[(Long, Long, Long)].flatMap { case (id, ts, sim) =>
      (0 until 4).map(b => BandRow(id, ts, b, ((sim >>> (16 * b)) & 0xffffL).toInt, sim))
    }
    // watermark AFTER the typed flatMap (a typed transform re-encodes
    // rows, so an earlier watermark column would not survive it)
    val withWm = bands
      .withColumn("evt", timestamp_millis(col("ts_ms")))
      .withWatermark("evt", s"$horizonMs milliseconds")
      .as[BandRowT]
    withWm.groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[BandState, BandVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // batch replay runs this same function where event-time
            // accessors may be undefined — degrade to no pruning
            val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            // micro-batch slice arrives unordered; first-wins needs
            // (ts, id) order, deterministic across partitionings
            val sorted = rows.toSeq.sortBy(r => (r.ts_ms, r.doc_id))
            val out = sorted.map { r =>
              // a prior is a match only if it is STRICTLY earlier in the
              // (ts, id) first-wins order — a late row (above watermark,
              // later micro-batch) must not be marked dup of a doc whose
              // event time is later than its own
              val hit = entries.exists { case (s, t, eid) =>
                r.ts_ms - t <= horizonMs &&
                  (t < r.ts_ms || (t == r.ts_ms && eid < r.doc_id)) &&
                  java.lang.Long.bitCount(s ^ r.sim) <= maxHamming }
              entries = (r.sim, r.ts_ms, r.doc_id) :: entries
              BandVerdict(r.doc_id, r.ts_ms, hit)
            }
            // rows with ts in [wm, maxEvt] are still admitted, and an
            // entry as old as wm - horizon is within horizonMs of a row
            // at ts = wm — pruning at wm alone would miss those matches
            val kept = entries.filter(_._2 >= wm - horizonMs)
            state.update(BandState(kept))
            val hi = kept.iterator.map(_._2).foldLeft(0L)(math.max)
            scala.util.Try( // no-op outside streaming event-time
              state.setTimeoutTimestamp(math.max(hi, wm + 1) + horizonMs))
            out.iterator
          }
      }
  }

  /** Stage 2: merge a doc's band verdicts (stateless — run per
    * micro-batch via foreachBatch, or directly on a batch replay's
    * verdict frame). A doc survives iff NO band saw a prior
    * in-horizon near-dup. */
  def mergeVerdicts(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("doc_id", "ts_ms")
      .agg(max(col("prior_match")).as("__hit"))
      .filter(!col("__hit"))
      .select(col("doc_id"), col("ts_ms"))

  final case class BudgetRow(doc_id: Long, ts_ms: Long, stratum: String,
    w: Long)
  final case class BudgetState(spent: Long)
  final case class BudgetAdmit(doc_id: Long, ts_ms: Long, stratum: String,
    cum_before: Long)

  /** Stateful token-budget gate — the ONLINE half of the batch
    * `sample_budget`: each stratum admits documents in ARRIVAL order
    * until its budget is spent, then drops everything after (overshoot
    * ≤ one doc, same fill contract as the batch op). The batch
    * operator's privilege — hash-priority order — needs the whole
    * corpus up front; a stream cannot reorder the future, so
    * first-come-first-served IS the online budget semantics.
    *
    * State: ONE long per stratum (admitted weight), `NoTimeout` — a
    * budget is corpus-lifetime, and O(strata) state never needs a
    * horizon. Strata absent from `budgets` drop before the state
    * store. Determinism: a micro-batch slice is processed in
    * (ts, id) order, so replaying the same micro-batch boundaries
    * admits the same set; on a BATCH frame the same function sees one
    * slice and admits exactly the (ts, id)-ordered prefix (the
    * equivalence the spec pins). Emits admitted rows only, with the
    * stratum's weight before them (audit column, mirrors
    * `sample_budget`). */
  def budgetGate(docs: DataFrame, budgets: Map[String, Long],
      idCol: String = "doc_id", stratumCol: String = "lang",
      weightCol: String = "n_chars", tsCol: String = "ts")
      : org.apache.spark.sql.Dataset[BudgetAdmit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val rows = docs
      .filter(col(stratumCol).isin(budgets.keys.toSeq: _*))
      .select(col(idCol).cast("long").as("doc_id"),
        unix_millis(col(tsCol)).as("ts_ms"),
        col(stratumCol).cast("string").as("stratum"),
        col(weightCol).cast("long").as("w"))
      .as[BudgetRow]
    rows.groupByKey(_.stratum)
      .flatMapGroupsWithState[BudgetState, BudgetAdmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (stratum, slice, state: GroupState[BudgetState]) =>
          val budget = budgets(stratum)
          var spent = state.getOption.map(_.spent).getOrElse(0L)
          val out = slice.toSeq.sortBy(r => (r.ts_ms, r.doc_id)).flatMap { r =>
            if (spent < budget) {
              val admit = BudgetAdmit(r.doc_id, r.ts_ms, stratum, spent)
              spent += r.w
              Some(admit)
            } else None
          }
          state.update(BudgetState(spent))
          out.iterator
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
