package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.GraftDataset
import graft.multimodal.BinaryMeta
import graft.streaming.EventStreams

class ModelStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("GraftDataset: derived fields resolve recursively and lazily") {
    val ds = GraftDataset(Seq((2.0, 3.0)).toDF("p0__x", "p0__y"))
      .withDerived("p0/r2")(g => g.field("p0/x") * g.field("p0/x") +
        g.field("p0/y") * g.field("p0/y"))
      .withDerived("p0/r")(g => sqrt(g.field("p0/r2")))
    val r = ds.select("p0/r").as[Double].head()
    assert(math.abs(r - math.sqrt(13.0)) < 1e-12)
  }

  test("GraftDataset: derived fields registered on the parent resolve in container views") {
    val ds = GraftDataset(Seq((2.0, 3.0)).toDF("gas__rho", "gas__u"))
      .withDerived("gas/p")(g => g.field("gas/rho") * g.field("gas/u"))
    val gas = ds.container("gas")
    assert(gas.select("p").as[Double].head() == 6.0)
    // still resolvable from the parent too
    assert(ds.select("gas/p").as[Double].head() == 6.0)
  }

  test("GraftDataset: container scoping and info") {
    val ds = GraftDataset(Seq((1.0, 2.0, 9L)).toDF("gas__rho", "gas__t", "star__id"))
      .withUnit("gas/rho", "g/cm^3")
    val gas = ds.container("gas")
    assert(gas.fieldNames.toSet == Set("rho", "t"))
    assert(ds.unitOf("gas/rho").contains("g/cm^3"))
    assert(ds.info.contains("gas/rho") && ds.info.contains("[g/cm^3]"))
  }

  test("GraftDataset: aliases resolve to targets with units; merge joins on key") {
    val ds = GraftDataset(Seq((1L, 2.0)).toDF("id", "mass"))
      .withUnit("mass", "Msun")
      .withAlias("m", "mass")
    assert(ds.select("m").as[Double].head() == 2.0)
    assert(ds.unitOf("m").contains("Msun"))
    val other = GraftDataset(Seq((1L, 7.0)).toDF("id", "vel"))
      .withUnit("vel", "km/s")
    val merged = ds.merge(other, Seq("id"))
    assert(merged.fieldNames.toSet.contains("vel"))
    assert(merged.select("vel").as[Double].head() == 7.0)
    assert(merged.unitOf("vel").contains("km/s"))
  }

  test("GraftDataset: unit metadata survives select; flatten explodes arrays") {
    val ds = GraftDataset(Seq((1.0, Seq(1.0, 2.0, 3.0))).toDF("m", "pos"))
      .withUnit("m", "Msun")
    val out = ds.select("m")
    assert(out.schema("m").metadata.getString("unit") == "Msun")
    val flat = ds.flatten(Map("pos" -> 3))
    assert(flat.columns.toSeq == Seq("m", "pos_0", "pos_1", "pos_2"))
    assert(flat.select("pos_2").as[Double].head() == 3.0)
  }

  test("BinaryMeta: batch decode plumbing with deterministic stub") {
    val df = Seq((1L, "hello"), (2L, "x")).toDF("doc_id", "text")
    val meta = BinaryMeta.decodeMeta(
      BinaryMeta.withPayload(df, "text"), "doc_id", "payload")
      .collect().sortBy(_.id)
    assert(meta(0).n_bytes == 5 && meta(1).n_bytes == 1)
    assert(meta(0).width == 5 && meta(0).height == 35)
    // 5 % 3 = 2 → webp; 1 % 3 = 1 → jpg
    assert(meta(0).format == "webp" && meta(1).format == "jpg")
  }

  test("BinaryMeta: feature-extract, resize, frame-sample plumbing") {
    val df = Seq((1L, "hello world"), (2L, "xy")).toDF("doc_id", "text")
    val withBin = BinaryMeta.withPayload(df, "text")
    val feats = BinaryMeta.featureExtract(withBin, "doc_id", "payload", dims = 8)
      .collect().sortBy(_.id)
    assert(feats.forall(_.embedding.length == 8))
    assert(feats.forall(_.embedding.forall(v => v >= -1f && v <= 1f)))
    // deterministic: same payload → same embedding
    val feats2 = BinaryMeta.featureExtract(withBin, "doc_id", "payload", dims = 8)
      .collect().sortBy(_.id)
    assert(feats.zip(feats2).forall { case (a, b) => a.embedding.sameElements(b.embedding) })
    val rs = BinaryMeta.resize(withBin, "doc_id", "payload", 32, 32)
      .collect().sortBy(_.id)
    assert(rs.forall(r => r.width == 32 && r.height == 32 && r.n_bytes > 0))
    val frames = BinaryMeta.frameSample(withBin, "doc_id", "payload", nFrames = 4)
      .collect()
    assert(frames.count(_.id == 1L) == 4)
    assert(frames.filter(_.id == 1L).map(_.offset).toSeq == Seq(0L, 2L, 5L, 8L))
  }

  test("streaming windowed agg over MemoryStream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedAgg(sdf, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((t(0, 10), "click", 1.0), (t(0, 40), "click", 2.0),
      (t(1, 5), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("winagg")
      .select("event_type", "n", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("streaming dedup drops repeated ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val sdf = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStreams.streamingDedup(sdf, "doc_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    mem.addData((1L, t(0), "a"), (1L, t(1), "a-dup"), (2L, t(2), "b"))
    q.processAllAvailable()
    mem.addData((2L, t(3), "b-dup"), (3L, t(4), "c"))
    q.processAllAvailable()
    val ids = spark.table("sdedup").select("doc_id")
      .as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment broadcasts the dim per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val sdf = mem.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrich(sdf, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData((1L, 5.0), (2L, 7.0), (9L, 1.0)) // 9 has no dim row → dropped
    q.processAllAvailable()
    val rows = spark.table("enriched").select("user_id", "value", "tier")
      .as[(Long, Double, String)].collect().toSet
    q.stop()
    assert(rows == Set((1L, 5.0, "gold"), (2L, 7.0, "basic")))
  }

  test("streaming anomaly gate flags by broadcast stats; batch replay identical") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Double)]
    val sdf = mem.toDF().toDF("event_type", "value")
    // batch-maintained robust stats in cents: median 500, MAD 100
    val stats = Seq(("click", 500L, 100L)).toDF("event_type", "med_c", "mad_c")
    val q = EventStreams.anomalyGate(sdf, stats)
      .writeStream.format("memory").queryName("agate")
      .outputMode("append").start()
    val rows = Seq(
      ("click", 5.0),   // |500-500| = 0      → normal
      ("click", 8.1),   // |810-500| = 310    → anomaly (> 300)
      ("click", 2.0),   // |200-500| = 300    → NOT > 300 → normal
      ("signup", 99.0)) // no stats row       → passes un-flagged
    mem.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("agate").select("event_type", "value", "is_anomaly")
      .as[(String, Double, Boolean)].collect().toSet
    q.stop()
    val expected = Set(("click", 5.0, false), ("click", 8.1, true),
      ("click", 2.0, false), ("signup", 99.0, false))
    assert(got == expected)
    // batch replay over the same rows = identical verdicts (stateless
    // gate: fate is a pure function of (row, stats))
    val batch = EventStreams.anomalyGate(
      rows.toDF("event_type", "value"), stats)
      .select("event_type", "value", "is_anomaly")
      .as[(String, Double, Boolean)].collect().toSet
    assert(batch == expected)
  }

  test("stream-stream interval join matches responses within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evts = MemoryStream[(Long, java.sql.Timestamp)]
    val resps = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val q = EventStreams.intervalJoin(
      evts.toDF().toDF("user_id", "ts"),
      resps.toDF().toDF("user_id", "r_ts", "resp"),
      "user_id", horizon = "10 minutes")
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").start()
    evts.addData((1L, t(0)), (2L, t(5)))
    // in-horizon for user 1 (t+3), out-of-horizon for user 2 (t+15),
    // before-event response for user 1 (t-? not possible at t0) —
    // wrong-key response never matches
    resps.addData((1L, t(3), "ok"), (2L, t(20), "late"), (3L, t(4), "nokey"))
    q.processAllAvailable()
    val rows = spark.table("ivjoin").select("user_id", "resp")
      .as[(Long, String)].collect().toSet
    q.stop()
    assert(rows == Set((1L, "ok")))
  }

  test("streaming sessionize emits sessions after gap timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Evt]
    val q = EventStreams.sessionize(mem.toDS(), gapUs = 1000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // two sessions for user 1 within one batch: gap of 5000us > 1000us
    mem.addData(EventStreams.Evt(1L, 0L, 1.0), EventStreams.Evt(1L, 500L, 2.0),
      EventStreams.Evt(1L, 6000L, 7.0))
    // NOTE: processAllAvailable() can hang with ProcessingTimeTimeout
    // (timeout scheduling keeps the stream "not caught up") — poll the
    // sink with a deadline instead. The deadline is generous because
    // the full suite runs many Spark suites in parallel on a shared
    // box: under that contention a single micro-batch has been
    // observed to exceed 60 s (the success path exits the loop on the
    // first non-empty poll, so a long deadline costs nothing there).
    val deadline = System.currentTimeMillis + 180000
    def closedNow() = spark.table("sess")
      .select("user_id", "n_events", "value_sum")
      .as[(Long, Long, Double)].collect().toSet
    var closed = closedNow()
    while (closed.isEmpty && System.currentTimeMillis < deadline) {
      Thread.sleep(250); closed = closedNow()
    }
    q.stop()
    // first session (2 events, sum 3.0) closes when the 6000us event
    // arrives. The SECOND session (the lone 6000us event) closes via
    // the processing-time timeout ~1ms of wall time later — whether it
    // appears depends on how many micro-batches ran before the poll
    // saw data, and BOTH outcomes are correct sessionize behavior, so
    // accept it rather than race it.
    assert(closed.contains((1L, 2L, 3.0)))
    assert(closed.subsetOf(Set((1L, 2L, 3.0), (1L, 1L, 7.0))))
  }
}
