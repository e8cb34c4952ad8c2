package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CorpusStreams

/** Streaming corpus-hygiene pipeline: the same declarative cleaning
  * plan as the batch `pipeline_clean`, run incrementally — stateless
  * gate stages, watermark-bounded dedup state, and batch/stream
  * EQUIVALENCE on identical input (the property that makes one
  * implementation serve both sides). */
class CorpusStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  // (doc_id, ts, text): ids 1-3 good English (3 == 1's exact dup),
  // 4 junk (no stopwords), 5 German, 6 too short
  private val docs = Seq(
    (1L, ts(0), "the quick brown fox jumps over a lazy dog"),
    (2L, ts(1), "a different document with the usual words and things"),
    (3L, ts(2), "the quick brown fox jumps over a lazy dog"),
    (4L, ts(3), "zzz qqq www rrr ttt yyy uuu iii"),
    (5L, ts(4), "der hund und die katze laufen durch das haus heute"),
    (6L, ts(5), "too short"))

  test("streaming clean-ingest: gate drops junk, dedup keeps first occurrence") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val sdf = in.toDF().toDF("doc_id", "ts", "text")
    val q = CorpusStreams.cleanIngest(sdf)
      .select("doc_id", "ws_tokens", "bpe_tokens")
      .writeStream.format("memory").queryName("cleaned")
      .outputMode("append").start()
    try {
      in.addData(docs.take(3))
      q.processAllAvailable()
      in.addData(docs.drop(3))
      q.processAllAvailable()
      val kept = spark.table("cleaned").select("doc_id").as[Long].collect().sorted
      // 3 dropped as in-horizon dup of 1; 4 fails stopword gate; 5 is
      // German; 6 fails min word count
      assert(kept.toSeq == Seq(1L, 2L))
      val toks = spark.table("cleaned").filter(col("doc_id") === 1L)
        .select("ws_tokens").as[Int].head()
      assert(toks == 9)
    } finally q.stop()
  }

  test("batch/stream equivalence: the same plan on the same rows keeps the same docs") {
    val batch = CorpusStreams.cleanIngest(
      docs.toDF("doc_id", "ts", "text"))
      .select("doc_id").as[Long].collect().sorted
    assert(batch.toSeq == Seq(1L, 2L))
  }

  test("sampling gate is stateless and arrival-invariant (stream == batch == replay)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 512L).map(i =>
      (i, ts(i.toInt), if (i % 2 == 0) "en" else "es"))
    val rates = Map("en" -> 0.25, "es" -> 0.75)
    // batch admission set
    val batch = CorpusStreams.sampleGate(
        rows.toDF("doc_id", "ts", "lang"), rates = rates)
      .select("doc_id").as[Long].collect().sorted
    // streaming admission set, data split across micro-batches
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusStreams.sampleGate(
        in.toDF().toDF("doc_id", "ts", "lang"), rates = rates)
      .select("doc_id")
      .writeStream.format("memory").queryName("sampled")
      .outputMode("append").start()
    try {
      in.addData(rows.take(200)); q.processAllAvailable()
      in.addData(rows.drop(200)); q.processAllAvailable()
      val streamed = spark.table("sampled").as[Long].collect().sorted
      assert(streamed.toSeq == batch.toSeq,
        "micro-batched arrival must admit exactly the batch set")
    } finally q.stop()
    // sanity: both strata sampled at roughly their rates
    assert(math.abs(batch.count(_ % 2 == 0) / 256.0 - 0.25) < 0.08)
    assert(math.abs(batch.count(_ % 2 == 1) / 256.0 - 0.75) < 0.08)
  }

  test("decontamination gate is stateless: stream admits the batch set") {
    implicit val sqlCtx = spark.sqlContext
    // eval shingles from doc 1's text: docs 1 and 3 (its dup) must
    // drop; every other doc passes regardless of arrival order
    val evalShingles = graft.dedup.Dedup
      .withShingles(Seq((1L, docs.head._3)).toDF("doc_id", "text"),
        "doc_id", "text", 3)
      .select(explode(col("sh"))).as[String].collect().toSeq
    val batch = CorpusStreams.decontaminationGate(
        docs.toDF("doc_id", "ts", "text"), evalShingles)
      .select("doc_id").as[Long].collect().sorted
    assert(batch.toSeq == Seq(2L, 4L, 5L, 6L))
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusStreams.decontaminationGate(
        in.toDF().toDF("doc_id", "ts", "text"), evalShingles)
      .select("doc_id")
      .writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      in.addData(docs.drop(3)); q.processAllAvailable() // reversed arrival
      in.addData(docs.take(3)); q.processAllAvailable()
      val streamed = spark.table("decon").as[Long].collect().sorted
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("dedup state is per content hash, not per id: changed text passes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val sdf = in.toDF().toDF("doc_id", "ts", "text")
    val q = CorpusStreams.cleanIngest(sdf)
      .select("doc_id")
      .writeStream.format("memory").queryName("rehash")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        (10L, ts(0), "the quick brown fox jumps over a lazy dog"),
        (10L, ts(1), "the slow brown fox walks under a lazy dog")))
      q.processAllAvailable()
      // same id, different content → both kept
      assert(spark.table("rehash").count() == 2)
    } finally q.stop()
  }

  // near-dup gate fixtures: ts as epoch millis (the operator's time
  // contract); d3 repeats d1's text exactly (Hamming 0 — must drop),
  // d4 and d2 are unrelated (keep)
  private val ndDocs = Seq(
    (1L, 1000L, "the quick brown fox jumps over a lazy dog today"),
    (2L, 2000L, "completely different content about spark catalyst planning"),
    (3L, 3000L, "the quick brown fox jumps over a lazy dog today"),
    (4L, 4000L, "yet another unrelated document mentioning zarr chunk layouts"))

  test("streaming near-dup gate: band-stateful verdicts + per-batch merge") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val verdicts = CorpusStreams.nearDupBandVerdicts(
      in.toDF().toDF("doc_id", "ts", "text"))
    val kept = scala.collection.mutable.SortedSet.empty[Long]
    val q = verdicts.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CorpusStreams.BandVerdict], _: Long) =>
        CorpusStreams.mergeVerdicts(batch.toDF())
          .select("doc_id").as[Long].collect().foreach(kept += _)
        ()
      }.start()
    try {
      in.addData(ndDocs.take(2)) // d1, d2 in batch 1
      q.processAllAvailable()
      in.addData(ndDocs.drop(2)) // d3 (dup of d1), d4 in batch 2
      q.processAllAvailable()
      // d3's near-dup arrived in an EARLIER micro-batch: only state
      // can drop it
      assert(kept.toSeq == Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("near-dup gate batch replay matches an independent pairwise reference") {
    val df = ndDocs.toDF("doc_id", "ts", "text")
    val got = CorpusStreams.mergeVerdicts(
      CorpusStreams.nearDupBandVerdicts(df).toDF())
      .select("doc_id").as[Long].collect().sorted.toSeq
    // reference: doc dropped iff ANY earlier doc's simhash is within
    // Hamming 3 — computed straight from the signature column
    val sims = graft.functions.Hashing.simhashes(
      df.select(col("doc_id"), split(col("text"), " ").as("w")), "doc_id", "w")
      .as[(Long, Long)].collect().toMap
    val want = ndDocs.collect { case (id, ts, _)
      if !ndDocs.exists { case (id2, ts2, _) =>
        Ordering[(Long, Long)].lt((ts2, id2), (ts, id)) &&
          java.lang.Long.bitCount(sims(id2) ^ sims(id)) <= 3 } => id }.sorted
    assert(got == want && want == Seq(1L, 2L, 4L))
  }

  test("budget gate: per-stratum arrival-order fill, state survives micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val sdf = in.toDF().toDF("doc_id", "ts", "lang", "n_chars")
    val budgets = Map("en" -> 100L, "de" -> 45L) // fr unbudgeted
    val q = CorpusStreams.budgetGate(sdf, budgets)
      .writeStream.format("memory").queryName("budgeted")
      .outputMode("append").start()
    // en docs of 40 chars each: budget 100 admits 3 (spent 0,40,80 —
    // overshoot one doc at 120); de 20 chars: 45 admits 3; fr drops
    val rows = (1L to 6L).map(i => (i, ts(i.toInt), "en", 40L)) ++
      (11L to 16L).map(i => (i, ts(i.toInt), "de", 20L)) ++
      Seq((21L, ts(1), "fr", 5L))
    try {
      in.addData(rows.take(4)) // en 1-4 in batch 1
      q.processAllAvailable()
      in.addData(rows.drop(4)) // rest in batch 2: en budget already spent
      q.processAllAvailable()
      val got = spark.table("budgeted")
        .select("doc_id", "stratum", "cum_before")
        .as[(Long, String, Long)].collect().sortBy(_._1)
      assert(got.filter(_._2 == "en").map(_._1).toSeq == Seq(1L, 2L, 3L),
        s"en must admit the arrival prefix: ${got.toSeq}")
      assert(got.filter(_._2 == "en").map(_._3).toSeq == Seq(0L, 40L, 80L))
      assert(got.filter(_._2 == "de").map(_._1).toSeq == Seq(11L, 12L, 13L))
      assert(!got.exists(_._2 == "fr"))
    } finally q.stop()
    // batch replay: the same function on the same rows admits the
    // identical set (one slice, (ts, id)-ordered prefix)
    val batch = CorpusStreams.budgetGate(
        rows.toDF("doc_id", "ts", "lang", "n_chars"), budgets)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(batch == Seq(1L, 2L, 3L, 11L, 12L, 13L))
  }
}
