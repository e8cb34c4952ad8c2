package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.TextOps
import graft.operators.Sampling

/** Corpus-hygiene operators: PII redaction, URL canonicalization,
  * paragraph dedup, stratified hash sampling. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces every occurrence of each class") {
    val df = Seq(
      (1L, "mail a.b+c@x-y.org and d@e.io call 555-1234 then 555-0000 ip 10.0.0.1"),
      (2L, "no pii here, just words and 1234 numbers 12-34"))
      .toDF("id", "t")
      .select(col("id"), TextOps.redactPii(col("t")).as("r"))
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) ==
      "mail <EMAIL> and <EMAIL> call <PHONE> then <PHONE> ip <IP>")
    assert(out(2L) == "no pii here, just words and 1234 numbers 12-34")
  }

  test("piiCounts counts per class before redaction") {
    val (ne, np, ni) = TextOps.piiCounts(col("t"))
    val row = Seq("a@b.co c@d.io 555-9999 1.2.3.4 5.6.7.8").toDF("t")
      .select(ne, np, ni).head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((2, 1, 2)))
  }

  test("normalizeUrl strips scheme, www, tracking, trailing slash; keeps path case") {
    val cases = Seq(
      "https://WWW.Ex.COM/A/b?q=1#f" -> "ex.com/a/b",
      "http://ex.com/" -> "ex.com",
      "ex.com/path/" -> "ex.com/path",
      "ftp://www.ex.com" -> "ex.com",
      "https://sub.www.ex.com/x" -> "sub.www.ex.com/x") // only LEADING www.
    val out = cases.map(_._1).toDF("u")
      .select(TextOps.normalizeUrl(col("u"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
    val dom = Seq("a.b.c/x/y").toDF("u")
      .select(TextOps.urlDomain(col("u"))).as[String].head()
    assert(dom == "a.b.c")
  }

  test("paragraphDedup keeps a paragraph only in its lowest-id document") {
    val docs = Seq(
      (10L, "unique ten\n\nshared para\n\nbody ten"),
      (3L, "unique three\n\nshared para\n\nbody three"),
      (7L, "unique seven\n\nshared para\n\nbody three"))
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2)) -> r.getBoolean(3)).toMap
    assert(out((3L, "shared para")) && !out((10L, "shared para")) &&
      !out((7L, "shared para")))
    // duplicated BODY across docs follows the same min rule
    assert(out((3L, "body three")) && !out((7L, "body three")))
    assert(out((10L, "unique ten")) && out((7L, "unique seven")))
  }

  test("stratifiedSample is deterministic, partition-invariant, and rate-accurate") {
    val df = (0L until 4096L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val rates = Map("a" -> 0.25)
    val kept1 = Sampling.stratifiedSample(df, "id", "s", rates)
      .select("id").as[Long].collect().sorted
    val kept2 = Sampling.stratifiedSample(df.repartition(13), "id", "s", rates)
      .select("id").as[Long].collect().sorted
    assert(kept1.toSeq == kept2.toSeq) // partition-invariant
    val aKept = kept1.count(_ % 2 == 0)
    assert(math.abs(aKept.toDouble / 2048 - 0.25) < 0.05) // ~rate on stratum a
    assert(kept1.count(_ % 2 == 1) == 2048) // stratum b: no rate -> keep all
    // growing the corpus never changes an existing row's fate
    val grown = (0L until 8192L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val keptGrown = Sampling.stratifiedSample(grown, "id", "s", rates)
      .filter(col("id") < 4096).select("id").as[Long].collect().sorted
    assert(keptGrown.toSeq == kept1.toSeq)
  }

  test("temperatureRates: alpha=1 is identity; alpha<1 flattens toward uniform") {
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small"))).toDF("id", "s")
    val r1 = Sampling.temperatureRates(df, "s", alpha = 1.0)
    assert(r1.values.forall(r => math.abs(r - 1.0) < 1e-12))
    val r05 = Sampling.temperatureRates(df, "s", alpha = 0.5)
    // rare stratum upsamples, head downsamples; expected total
    // preserved: sum_s n_s * r_s == N
    assert(r05("small") > 1.0 && r05("big") < 1.0)
    val total = 900 * r05("big") + 100 * r05("small")
    assert(math.abs(total - 1000.0) < 1e-6)
  }

  test("repeatSample: expectation ~rate, partition-invariant, growth-stable") {
    val df = ((0L until 2048L).map(i => (i, "up")) ++
      (2048L until 4096L).map(i => (i, "down"))).toDF("id", "s")
    val rates = Map("up" -> 2.25, "down" -> 0.5)
    val out1 = Sampling.repeatSample(df, "id", "s", rates)
      .select("id", "copy").as[(Long, Long)].collect().sorted
    val out2 = Sampling.repeatSample(df.repartition(13), "id", "s", rates)
      .select("id", "copy").as[(Long, Long)].collect().sorted
    assert(out1.toSeq == out2.toSeq) // partition-invariant
    val upRows = out1.count(_._1 < 2048)
    val downRows = out1.count(_._1 >= 2048)
    // expectation r copies per doc (md5 uniformity, 2048 draws)
    assert(math.abs(upRows / 2048.0 - 2.25) < 0.1)
    assert(math.abs(downRows / 2048.0 - 0.5) < 0.1)
    // whole copies: every kept 'up' doc has copies 1..2 at least
    val upDocs = out1.filter(_._1 < 2048).groupBy(_._1).view.mapValues(_.length)
    assert(upDocs.values.forall(n => n == 2 || n == 3))
    // a doc's copy count never changes when OTHER strata change
    val out3 = Sampling.repeatSample(df, "id", "s",
        Map("up" -> 2.25, "down" -> 0.9))
      .filter(col("id") < 2048)
      .select("id", "copy").as[(Long, Long)].collect().sorted
    assert(out3.toSeq == out1.filter(_._1 < 2048).toSeq)
  }

  test("decontaminateOverlap drops on fraction, not any-hit; exact boundary") {
    // doc 1 = eval. doc 2 shares 2 of its 4 distinct shingles (50%),
    // doc 3 shares 1 of 4 (25%), doc 4 shares none.
    val docs = Seq(
      (1L, "a b c d e"), // eval: shingles {a b c, b c d, c d e}
      (2L, "a b c d x y z"), // {a b c, b c d, c d x, d x y, x y z} → 2/5
      (3L, "a b c q r s t"), // {a b c, b c q, c q r, q r s, r s t} → 1/5
      (4L, "p q r s t u")).toDF("doc_id", "text")
    val evalDocs = docs.filter(col("doc_id") === 1L)
    def surviving(pct: Int): Seq[Long] =
      graft.dedup.Dedup.decontaminateOverlap(docs, "doc_id", "text",
        evalDocs, "text", k = 3, minOverlapPct = pct)
        .select("doc_id").as[Long].collect().sorted.toSeq
    // 40%: doc 2 (2/5 = 40% >= 40) and eval itself (100%) drop
    assert(surviving(40) == Seq(3L, 4L))
    // exact boundary: 2/5 = 40% is NOT >= 41%
    assert(surviving(41) == Seq(2L, 3L, 4L))
    // 20%: doc 3 (1/5 = 20%) drops too
    assert(surviving(20) == Seq(4L))
    // any-hit decontaminate would drop 2 AND 3 regardless of fraction
    assert(graft.dedup.Dedup.decontaminate(docs, "doc_id", "text",
      evalDocs, "text", k = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(4L))
  }

  test("substringSpans finds maximal cross-doc spans, ignores within-doc repeats") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = "c0 c1 c2 c3 c4" // 5 shared words; k=3 => span [.,.] of 5
    val docs = Seq(
      (1L, s"${words("a", 4)} $shared ${words("b", 3)}"),      // span at words 4..8
      (2L, s"$shared ${words("d", 6)}"),                       // span at words 0..4
      (3L, s"${words("e", 2)} x y z x y z ${words("f", 2)}"),  // within-doc repeat only
      (4L, "too short"),                                       // < k words
      (5L, words("g", 12)))                                    // nothing shared
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(spans == Seq((1L, 4, 8, 5), (2L, 0, 4, 5)))
  }

  test("substringSpans merges overlapping duplicated shingles into one maximal span") {
    // doc 1 embeds a 7-word passage from doc 2: k=4 gives 4 duplicated
    // positional shingles that must merge into ONE maximal span of 7
    val passage = "p0 p1 p2 p3 p4 p5 p6"
    val docs = Seq(
      (10L, s"u0 u1 $passage u2"),
      (20L, s"$passage v0 v1 v2"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id")
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(spans == Seq((10L, 2, 8, 7), (20L, 0, 6, 7)))
  }

  test("maximalSpans: variable-length spans against the first occurrence; within-doc repeats count") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val passage = words("p", 9) // 9 shared words, k=3 minWords=5
    val docs = Seq(
      (1L, s"${words("a", 4)} $passage ${words("b", 3)}"), // first copy at 4..12
      (2L, s"$passage ${words("d", 6)}"),                  // later copy at 0..8
      (3L, s"q0 q1 q2 q3 q4 z0 q0 q1 q2 q3 q4"),           // within-doc repeat, 5 words
      (4L, words("g", 12)))                                // nothing shared
      .toDF("doc_id", "text")
    val spans = Dedup.maximalSpans(docs, "doc_id", "text", k = 3, minWords = 5)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Int, Long, Int)].collect().toSeq
    // doc 1's copy IS the first occurrence: it aligns against doc 2's
    // (the second); doc 2 aligns against doc 1. Doc 3's later
    // within-doc copy aligns against its own first occurrence, and
    // the first against the later one — both reported.
    assert(spans == Seq(
      (1L, 4, 12, 9, 2L, 0), (2L, 0, 8, 9, 1L, 4),
      (3L, 0, 4, 5, 3L, 6), (3L, 6, 10, 5, 3L, 0)))
  }

  test("maximalSpans: a window whose content first occurs elsewhere splits the chain conservatively") {
    // docs 1 and 2 share a 10-word passage, but the middle 3-gram of
    // doc 2's copy ALSO occurs (as the corpus-first occurrence) in
    // doc 0 — doc 2's chain against doc 1 breaks there and the two
    // fragments surface separately (spans stay verbatim-exact; they
    // are maximal w.r.t. the first-occurrence partner, NOT globally)
    val passage = "m0 m1 m2 m3 m4 m5 m6 m7 m8 m9"
    val docs = Seq(
      (0L, "x0 x1 m4 m5 m6 x2 x3"), // corpus-first owner of the middle 3-gram
      (1L, s"$passage y0 y1"),
      (2L, s"z0 z1 $passage"))
      .toDF("doc_id", "text")
    val spans = Dedup.maximalSpans(docs, "doc_id", "text", k = 3, minWords = 3)
      .as[(Long, Int, Int, Int, Long, Int)].collect().toSeq
    // every reported span must be verbatim-equal to its src slice
    val txt = docs.as[(Long, String)].collect().toMap
      .view.mapValues(_.split(" ")).toMap
    spans.foreach { case (d, s0, s1, w, sd, ss) =>
      assert(w == s1 - s0 + 1)
      assert(txt(d).slice(s0, s1 + 1).toSeq ==
        txt(sd).slice(ss, ss + w).toSeq, s"span $d[$s0..$s1] vs $sd[$ss]")
    }
    // doc 2 reports >= 2 fragments of its 10-word passage (split at
    // the doc-0-owned middle), and nothing longer than the passage
    val frag2 = spans.filter(x => x._1 == 2L && x._2 >= 2)
    assert(frag2.size >= 2 && frag2.map(_._4).max < 10)
  }

  test("substringScrub keeps the earliest copy and rewrites later ones") {
    val passage = "p0 p1 p2 p3 p4 p5 p6" // 7 words, duplicated 1 -> 2
    val docs = Seq(
      (1L, s"$passage a0 a1"),          // keeper: untouched
      (2L, s"b0 b1 $passage b2"),       // loses the 7 covered words
      (3L, "c0 c1 c2 c3 c4 c5 c6 c7"))  // unique: untouched
      .toDF("doc_id", "text")
    val out = Dedup.substringScrub(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id")
      .as[(Long, Int, Long, String)].collect().toSeq
    // md5 fingerprints must equal the md5 of the expected rewritten text
    def fp(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Seq(
      (1L, 9, 9L, fp(s"$passage a0 a1")),
      (2L, 10, 3L, fp("b0 b1 b2")),
      (3L, 8, 8L, fp("c0 c1 c2 c3 c4 c5 c6 c7"))))
  }

  test("substringScrub: a fully-duplicated later doc scrubs to empty, not absent") {
    val docs = Seq(
      (1L, "q0 q1 q2 q3 q4"),
      (2L, "q0 q1 q2 q3 q4")).toDF("doc_id", "text")
    val out = Dedup.substringScrub(docs, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .as[(Long, Int, Long, String)].collect().toSeq
    def fp(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Seq((1L, 5, 5L, fp("q0 q1 q2 q3 q4")),
      (2L, 5, 0L, fp(""))))
  }

  test("prefix sum over a hash-shuffle STRING key: shard walk is the driver cumsum") {
    // the shuffle_export shape: md5-keyed pseudo-shuffle order, token
    // budget cuts — PrefixSum's range partitioning must hold for
    // string keys exactly as for numeric group ids
    val budget = 100L
    val docs = (1L to 500L).map(i => (i, 1L + i % 37)).toDF("doc_id", "n")
      .select(col("doc_id"), col("n"),
        concat_ws("-", md5(col("doc_id").cast("string")),
          lpad(col("doc_id").cast("string"), 8, "0")).as("h"))
    val out = graft.operators.PrefixSum.exclusive(docs, "h", col("n"),
        buckets = 8, outCol = "start")
      .select(col("h"), col("n"), col("start"),
        expr(s"start div $budget").as("shard"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    var run = 0L
    out.foreach { case (h, n, start, shard) =>
      assert(start == run, s"offset at $h: $start != $run")
      assert(shard == run / budget)
      run += n
    }
    // shards are contiguous 0..max and every one is non-empty
    val shards = out.map(_._4).distinct.sorted
    assert(shards.head == 0L && shards.toSeq == (0L to shards.last).toSeq)
  }

  test("per-group prefix sum: resets per group, spans buckets, matches a window") {
    // 3 groups of very different sizes over 8 buckets — the big group
    // MUST span multiple range buckets (that is the point of the
    // operator vs a partition-by-group window)
    val rows = (1L to 400L).map(i => (i, if (i <= 300) "big"
      else if (i <= 380) "mid" else "tiny", 1L + i % 7))
    val df = rows.toDF("id", "g", "n")
      .withColumn("k", lpad(col("id").cast("string"), 8, "0"))
    val out = graft.operators.PrefixSum.exclusivePerGroup(df, "g", "k",
        col("n"), buckets = 8, outCol = "off")
      .select("g", "k", "n", "off")
      .as[(String, String, Long, Long)].collect()
    // reference: per-group running sum in key order
    val expect = rows.sortBy(r => (r._2, r._1))
      .groupBy(_._2).flatMap { case (g, rs) =>
        var run = 0L
        rs.sortBy(_._1).map { r => val o = (r._1, run); run += r._3; o }
      }.toMap
    out.foreach { case (g, k, n, off) =>
      assert(off == expect(k.toLong), s"group $g key $k: $off != ${expect(k.toLong)}")
    }
    // partition-invariance: a different input layout lands identically
    val out2 = graft.operators.PrefixSum.exclusivePerGroup(
        df.repartition(13), "g", "k", col("n"), buckets = 5, outCol = "off")
      .select("k", "off").as[(String, Long)].collect().toMap
    assert(out2 == out.map(r => r._2 -> r._4).toMap)
  }

  test("budgetSelect fills each budget, overshoots <= one doc, drops unbudgeted strata") {
    val docs = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", 10L))
      .toDF("doc_id", "lang", "w")
    val budgets = Map("a" -> 200L, "b" -> 45L) // c unbudgeted
    val out = graft.operators.Sampling.budgetSelect(docs, "doc_id", "lang",
        col("w"), budgets, buckets = 4)
      .select("doc_id", "lang", "cum_before")
      .as[(Long, String, Long)].collect()
    assert(!out.exists(_._2 == "c"))
    val byLang = out.groupBy(_._2).view.mapValues(_.map(_ => 10L).sum).toMap
    // filled to >= budget, overshoot at most one doc's weight
    assert(byLang("a") >= 200L && byLang("a") < 200L + 10L + 1)
    assert(byLang("b") >= 45L && byLang("b") <= 45L + 10L)
    // kept set is the hash-priority prefix: every kept doc's priority
    // precedes every dropped doc's priority within its stratum
    val pri = (id: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      md + id.toString.reverse.padTo(20, '0').reverse.mkString
    }
    for (l <- Seq("a", "b")) {
      val keptIds = out.filter(_._2 == l).map(_._1).toSet
      val all = (1L to 300L).filter(i => (if (i % 3 == 0) "a"
        else if (i % 3 == 1) "b" else "c") == l)
      val maxKept = keptIds.map(pri).max
      val minDropped = (all.toSet -- keptIds).map(pri).min
      assert(maxKept < minDropped, s"stratum $l: kept set is not a priority prefix")
    }
  }
}
