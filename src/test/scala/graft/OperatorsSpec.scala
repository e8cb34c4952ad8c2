package graft

import org.apache.spark.sql.functions._
// (crossMatch tests appended at the bottom of this suite)
import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("hist1d bins fixed-width and covers all rows") {
    val df = Seq(0.5, 1.5, 2.5, 2.9, 7.1).toDF("x")
    val h = Histograms.hist1d(df, col("x"), 1.0).collect()
    assert(h.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 1L), (1L, 1L), (2L, 2L), (7L, 1L)))
  }

  test("hist2d bins both axes") {
    val df = Seq((0.1, 0.1), (0.1, 1.1), (1.1, 1.1)).toDF("x", "y")
    val h = Histograms.hist2d(df, col("x"), 1.0, col("y"), 1.0).collect()
    assert(h.length == 3 && h.map(_.getLong(2)).sum == 3)
  }

  test("boxCut keeps half-open intervals") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Spatial.boxCut(df, Seq(("x", 2.0, 4.0))).as[Double].collect().sorted
    assert(r.toSeq == Seq(2.0, 3.0))
  }

  test("sphereCutPruned == exact sphereCut") {
    val df = (-10 to 10).flatMap(x => (-10 to 10).map(y => (x.toDouble, y.toDouble)))
      .toDF("x", "y")
    val exact = Spatial.sphereCut(df, Seq((col("x"), 1.0), (col("y"), -2.0)), 4.0)
      .count()
    val pruned = Spatial.sphereCutPruned(df, Seq(("x", 1.0), ("y", -2.0)), 4.0)
      .count()
    assert(exact == pruned && exact > 0)
  }

  test("range assign picks the containing band; bucketed variant agrees") {
    val df = Seq(-5.0, 0.0, 10.0, 99.9).toDF("v")
    val bands = Seq((-100.0, 0.0, "neg"), (0.0, 50.0, "low"), (50.0, 100.0, "high"))
    val r = RangeAssign.assign(df, col("v"), bands)
      .select("v", "band").as[(Double, String)].collect().toMap
    assert(r == Map(-5.0 -> "neg", 0.0 -> "low", 10.0 -> "low", 99.9 -> "high"))
    val bandDf = bands.toDF("lo", "hi", "band")
    val b = RangeAssign.assignBucketed(df, col("v"), bandDf,
      col("lo"), col("hi"), 7.0)
      .select("v", "band").as[(Double, String)].collect().toMap
    assert(b == r)
    val s = RangeAssign.assignSorted(df, col("v"), bands)
      .select("v", "band").as[(Double, String)].collect().toMap
    assert(s == r)
    // out-of-band values are dropped (inner-join semantics)
    val out = RangeAssign.assignSorted(
      Seq(-1000.0, 100.0).toDF("v"), col("v"), bands).count()
    assert(out == 0)
  }

  test("asof join attaches latest prior (inclusive) payload per key") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 10L))
      .toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 11L, "x"))
      .toDF("k", "t", "p")
    val r = AsOfJoin.asof(left, right, "k", "t", Seq("p"))
      .select("k", "t", "p").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(r == Set((1L, 10L, Some("a")), (1L, 20L, Some("b")),
      (1L, 5L, None), (2L, 10L, None)))
  }

  test("sessionize agrees with Spark's builtin session_window on real events") {
    val e = graft.sources.Tables.events(spark, sfDir)
    val gapUs = 1800L * 1000 * 1000
    val ours = Sessionize.sessions(e, "user_id", col("ts_us"), gapUs, col("value"))
      .select("user_id", "n_events")
      .as[(Long, Long)].collect().sorted.toSeq
    val builtin = e
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select("user_id", "n_events")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(ours == builtin)
  }

  test("series loader unions snapshots with tags (DatasetSeries)") {
    val s = graft.sources.Tables.series(spark,
      Seq("t0" -> "/root/testdata/sf0.001", "t1" -> "/root/testdata/sf0.01"),
      "region")
    assert(s.columns.contains("snapshot"))
    val counts = s.groupBy("snapshot").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("t0", "t1") && counts.values.forall(_ > 0))
  }

  test("asof tolerance nulls stale matches; forward as-of looks ahead") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 10L, "old"), (1L, 98L, "recent")).toDF("k", "t", "p")
    val tol = AsOfJoin.asofTolerance(left, right, "k", "t", Seq("p"), tolerance = 5L)
      .select("p").as[Option[String]].head()
    assert(tol.contains("recent"))
    val tight = AsOfJoin.asofTolerance(left, right, "k", "t", Seq("p"), tolerance = 1L)
      .select("p").as[Option[String]].head()
    assert(tight.isEmpty) // nearest match is 2 units away > tolerance 1
    val fwd = AsOfJoin.asofForward(
      Seq((1L, 50L)).toDF("k", "t"), right, "k", "t", Seq("p"))
      .select("p").as[Option[String]].head()
    assert(fwd.contains("recent")) // earliest right at t >= 50 is t=98
  }

  test("unit registry converts within a dimension and rejects mismatches") {
    val ds = graft.model.GraftDataset(Seq(2.0).toDF("d"))
      .withUnit("d", "kpc")
    val inPc = Seq(2.0).toDF("d")
      .select(ds.convertTo("d", "pc").as("pc")).as[Double].head()
    assert(math.abs(inPc - 2000.0) < 1e-9)
    intercept[IllegalArgumentException] {
      graft.model.Units.factor("kpc", "Msun")
    }
  }

  test("sessionize splits on gap and aggregates per session") {
    val df = Seq((1L, 0L, 1.0), (1L, 10L, 1.0), (1L, 200L, 1.0),
      (2L, 0L, 5.0)).toDF("user_id", "t", "value")
    val s = Sessionize.sessions(df, "user_id", col("t"), 50L, col("value"))
      .select("user_id", "session_seq", "n_events", "value_sum")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(s == Set((1L, 1L, 2L, 2.0), (1L, 2L, 1L, 1.0), (2L, 1L, 1L, 5.0)))
  }

  test("FrequencySketch.heavyHitters finds hot keys in one bounded pass") {
    // key 7 occurs 500x, key 9 occurs 40x, 1..1000 occur once each.
    // Summary counts are Misra-Gries UNDERestimates (short by up to
    // N/(capacity+1) ≈ 23 here), so the threshold sits below key 9's
    // worst-case summary count, not at its true count.
    val df = (Seq.fill(500)(7L) ++ Seq.fill(40)(9L) ++ (1L to 1000L))
      .toDF("k")
    val hot = graft.operators.FrequencySketch
      .heavyHitters(df, "k", capacity = 64, minCount = 10)
    assert(hot.toSet == Set(7L, 9L), s"got ${hot.mkString(",")}")
    // bounded capacity never reports a merely-warm key above threshold
    val none = graft.operators.FrequencySketch
      .heavyHitters(df, "k", capacity = 64, minCount = 1000)
    assert(none.isEmpty)
  }

  test("Skew.saltedJoin equals the plain join on skewed data") {
    // key 1 is hot (200 rows), others are singletons
    val fact = ((1 to 200).map(i => (1L, i.toDouble)) ++
      (2L to 20L).map(k => (k, k.toDouble))).toDF("k", "v")
    val build = (1L to 20L).map(k => (k, s"name$k")).toDF("bk", "name")
    val salted = graft.operators.Skew.saltedJoin(fact, "k", build, "bk",
      nSalt = 4, hotThreshold = 5, sampleFraction = 1.0)
      .select("k", "v", "name")
    val plain = fact.join(build, col("k") === col("bk")).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("crossMatch finds pairs within radius via zone equi-join (no cartesian)") {
    // known geometry: b1 is 0.5 deg from a1 in dec (match at r=1),
    // b2 is 2 deg away (no match), b3 matches a2 across a zone edge
    val a = Seq((1L, 10.0, 0.3), (2L, 200.0, 0.99)).toDF("aid", "ra", "dec")
    val b = Seq((11L, 10.0, 0.8), (12L, 10.0, 2.3), (13L, 200.0, 1.01))
      .toDF("bid", "ra", "dec")
    val m = Spatial.crossMatch(a, "aid", "ra", "dec", b, "bid", "ra", "dec",
      radiusDeg = 1.0)
    val pairs = m.select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 11L), (2L, 13L)))
    // the candidate join must be a hash equi-join on the zone key —
    // never a cartesian/broadcast-nested-loop over the catalogs
    val p = m.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(600))
    // RA wrap caveat: matches across the 0/360 seam need ra
    // normalization upstream (documented limitation, as in the Zones
    // paper's basic form)
  }

  test("RangeJoin.pointInInterval == brute-force BETWEEN join") {
    // intervals chosen to cross bucket edges (width 10): [5,25] spans
    // 3 buckets, [18,22] spans 2; ends are inclusive on both sides
    val points = Seq((1L, 101L, 5L), (1L, 102L, 10L), (1L, 103L, 25L),
      (1L, 104L, 26L), (2L, 201L, 20L), (3L, 301L, 20L))
      .toDF("k", "pid", "t")
    val ivals = Seq((1L, 5L, 25L, "a"), (1L, 18L, 22L, "b"),
      (2L, 0L, 19L, "c"), (2L, 20L, 20L, "d"))
      .toDF("k", "s", "e", "tag")
    val got = RangeJoin.pointInInterval(points, ivals, "k", "t", "s", "e", 10L)
      .select("pid", "tag").as[(Long, String)].collect().toSet
    val brute = points.join(ivals.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "tag").as[(Long, String)].collect().toSet
    assert(got == brute && got == Set((101L, "a"), (102L, "a"), (103L, "a"),
      (201L, "d")))
    // the rewrite must not duplicate a (point, interval) pair even
    // when the interval spans several buckets: a point lives in
    // exactly one bucket, so each pair joins at most once
    val n = RangeJoin.pointInInterval(points, ivals, "k", "t", "s", "e", 10L).count()
    assert(n == 4L)
    // bucket width only shifts constants, never the result set: the
    // same join at widths that under- and over-shoot the interval
    // lengths must agree exactly
    Seq(1L, 3L, 100L).foreach { w =>
      val alt = RangeJoin.pointInInterval(points, ivals, "k", "t", "s", "e", w)
        .select("pid", "tag").as[(Long, String)].collect().toSet
      assert(alt == got, s"width $w diverged")
    }
  }

  test("histDD generalizes hist1d/hist2d and sums weights per cell") {
    import graft.operators.Histograms
    val df = Seq((1.0, 10.0, 0.5), (2.0, 10.0, 1.0), (11.0, 10.0, 2.0),
      (1.0, 25.0, 4.0)).toDF("x", "y", "w")
    // 1-dim histDD == hist1d
    val h1 = Histograms.hist1d(df, col("x"), 10.0)
      .as[(Long, Long)].collect().toSeq
    val hdd1 = Histograms.histDD(df, Seq((col("x"), 10.0)))
      .as[(Long, Long)].collect().toSeq
    assert(h1 == hdd1)
    // 2-dim histDD == hist2d (modulo column names)
    val h2 = Histograms.hist2d(df, col("x"), 10.0, col("y"), 10.0)
      .as[(Long, Long, Long)].collect().toSeq
    val hdd2 = Histograms.histDD(df, Seq((col("x"), 10.0), (col("y"), 10.0)))
      .as[(Long, Long, Long)].collect().toSeq
    assert(h2 == hdd2)
    // 3-dim weighted: cells and weight sums
    val h3 = Histograms.histDD(df,
        Seq((col("x"), 10.0), (col("y"), 10.0), (col("w"), 1.0)),
        weight = Some(col("w")))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(h3 == Seq((0L, 1L, 0L, 1L, 0.5), (0L, 1L, 1L, 1L, 1.0),
      (0L, 2L, 4L, 1L, 4.0), (1L, 1L, 2L, 1L, 2.0)))
    // plan shape: the one shuffle carries partial-aggregated cells
    val p = Histograms.histDD(df, Seq((col("x"), 10.0), (col("y"), 10.0)))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), p.take(800))
  }

  test("RangeJoin survives exotic column names; __bucket collision errors") {
    // names needing backquotes in any parsed context: dots (parse as
    // struct access), spaces, and an embedded backquote (must double)
    val points = Seq((1L, 101L, 5L), (1L, 102L, 30L))
      .toDF("k", "pid", "t.time `x")
    val ivals = Seq((1L, 0L, 10L, "a")).toDF("k", "s col", "e col", "tag")
    val got = RangeJoin.pointInInterval(points, ivals,
        "k", "t.time `x", "s col", "e col", 7L)
      .select("pid", "tag").as[(Long, String)].collect().toSet
    assert(got == Set((101L, "a")))
    // a pre-existing __bucket column must error loudly, not be
    // silently overwritten
    val clash = points.withColumnRenamed("pid", "__bucket")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(clash, ivals,
        "k", "t.time `x", "s col", "e col", 7L)
    }
    assert(e.getMessage.contains("__bucket"))
  }

  test("minhashIncrementalKeep drops batch docs near-dup to base, keeps the rest") {
    // base doc 1 and batch doc 3 share identical text (J = 1.0);
    // batch doc 6 is unique; batch docs are NOT deduped against each
    // other (9 duplicates 6 but both survive — only base matches drop)
    val mk = (0 until 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, mk), (2L, "totally different base text here"),
      (3L, mk), (6L, (100 until 140).map(i => s"u$i").mkString(" ")),
      (9L, (100 until 140).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = graft.dedup.Dedup.minhashIncrementalKeep(
      docs.filter($"doc_id" < 3), docs.filter($"doc_id" >= 3),
      "doc_id", "text", k = 3, sigLen = 64, bands = 16, minJ = 0.8)
      .as[Long].collect().toSet
    assert(kept == Set(6L, 9L))
  }

  test("cicDeposit: trilinear weights conserve mass; wrap is periodic; map-only plan") {
    // points straddling cell centers AND the box edge (x=0.1 deposits
    // into the wrapped cell gridN-1)
    val pts = Seq((0.1, 5.0, 9.9), (2.5, 2.5, 2.5), (7.4, 0.0, 3.3))
      .toDF("x", "y", "z")
    val out = Spatial.cicDeposit(pts, col("x"), col("y"), col("z"),
      boxSize = 10.0, gridN = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    // brute force with the same arithmetic
    val h = 2.5
    val brute = scala.collection.mutable.Map
      .empty[(Long, Long, Long), (Long, Long)].withDefaultValue((0L, 0L))
    for ((x, y, z) <- Seq((0.1, 5.0, 9.9), (2.5, 2.5, 2.5), (7.4, 0.0, 3.3))) {
      def ax(v: Double) = {
        val xi = v / h; val i = math.floor(xi - 0.5).toLong
        (i, (xi - 0.5) - i)
      }
      val (ix, fx) = ax(x); val (iy, fy) = ax(y); val (iz, fz) = ax(z)
      for (dx <- 0 to 1; dy <- 0 to 1; dz <- 0 to 1) {
        val cell = (((ix + dx) % 4 + 4) % 4, ((iy + dy) % 4 + 4) % 4,
          ((iz + dz) % 4 + 4) % 4)
        val w = (if (dx == 0) 1 - fx else fx) * (if (dy == 0) 1 - fy else fy) *
          (if (dz == 0) 1 - fz else fz)
        val micro = math.floor(w * 1e6 + 0.5).toLong
        val (n0, m0) = brute(cell)
        brute(cell) = (n0 + 1, m0 + micro)
      }
    }
    assert(out == brute.toMap)
    // each particle's 8 weights sum to 1 (± micro rounding)
    val total = out.values.map(_._2).sum
    assert(math.abs(total - 3L * 1000000L) <= 3 * 4)
    // deposition is scan → explode → one aggregation: no join of any kind
    val p = Spatial.cicDeposit(pts, col("x"), col("y"), col("z"), 10.0, 4)
      .queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("join"), p.take(600))
  }

  test("fofGroups links chains across cells; singletons label themselves") {
    // chain 1-2-3 spans a cell boundary at linkLen 2 (1.5, 3.0, 4.4);
    // 4 is beyond the link from 3; 5 is isolated — transitivity must
    // group {1,2,3} even though 1 and 3 are 2.9 apart (> linkLen)
    val pts = Seq(
      (1L, 1.5, 0.0, 0.0), (2L, 3.0, 0.0, 0.0), (3L, 4.4, 0.0, 0.0),
      (4L, 7.0, 0.0, 0.0), (5L, 50.0, 50.0, 50.0))
      .toDF("id", "x", "y", "z")
    val got = Spatial.fofGroups(pts, "id", col("x"), col("y"), col("z"),
      linkLen = 2.0)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("pairCounts == brute-force pair histogram; grid join is equi, not cartesian") {
    // pseudo-random but deterministic points in a 30³ box — pairs
    // cross cell boundaries in every direction at rMax=5
    val pts = (1L to 120L).map(i =>
      (i, (i * 17 % 300) / 10.0, (i * 29 % 300) / 10.0, (i * 43 % 300) / 10.0))
      .toDF("id", "x", "y", "z")
    val got = Spatial.pairCounts(pts, "id", col("x"), col("y"), col("z"),
        rMax = 5.0, binWidth = 1.0)
      .select("bin", "dd").as[(Int, Long)].collect().toMap
    // brute force over all N² ordered pairs, halved by id<
    val rows = pts.as[(Long, Double, Double, Double)].collect()
    val brute = (for {
      a <- rows; b <- rows if a._1 < b._1
      r = math.floor(math.sqrt(math.pow(a._2 - b._2, 2) +
        math.pow(a._3 - b._3, 2) + math.pow(a._4 - b._4, 2)) * 1e9 + 0.5) / 1e9
      if r < 5.0
    } yield math.floor(r).toInt).groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got == brute && got.values.sum > 0)
    // pair discovery must be the cell-key hash equi-join — a
    // cartesian/BNL product would be O(N²) at any scale
    val p = Spatial.pairCounts(pts, "id", col("x"), col("y"), col("z"), 5.0, 1.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(600))
    // a reserved internal name collides loudly
    val e = intercept[IllegalArgumentException] {
      Spatial.pairCounts(pts.withColumnRenamed("x", "__cx"), "id",
        col("__cx"), col("y"), col("z"), 5.0, 1.0)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
