package graft

import org.apache.spark.sql.functions._

/** Round-9 curation additions: bigram-LM corpus scoring, int8
  * embedding quantization, quality-aware cluster dedup, per-source
  * rollup — semantic checks beyond the DuckDB hash gate.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("ngram_lm_score: scores are negative log-probs; corpus-typical docs beat outliers") {
    val rows = CacheScope.withScope {
      q("ngram_lm_score").collect()
    }
    assert(rows.nonEmpty)
    // add-one smoothed probabilities are < 1 → every avg logp < 0
    assert(rows.forall(_.getDouble(2) < 0.0))
    // n_bigrams = words-1 for each doc (no doc in the corpus is < 2 words)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.getLong(1) == docs(r.getLong(0))))
  }

  test("ngram_lm_score: a repeated-bigram doc outscores an all-unique-bigram doc") {
    // tiny corpus where doc 1 reuses the corpus's dominant bigram and
    // doc 2 is one-off gibberish — the LM must rank 1 above 2
    val docs = Seq(
      (1L, "the cat sat the cat sat the cat sat"),
      (2L, "qz wv xj kq vb nm pw"),
      (3L, "the cat sat on the cat sat"),
      (4L, "the cat sat beside the cat"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CacheScope.withScope {
      SparkEntry.queries("ngram_lm_score")(spark, dir).collect()
    }.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
    assert(out(3L) > out(2L))
  }

  test("embedding_quantize: checksums bound codes to [0,254] and mse to (s/2)^2") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val stats = e.agg(
      array((0 until 64).map(i => min(col("embedding").getItem(i).cast("double"))): _*).as("mns"),
      array((0 until 64).map(i => max(col("embedding").getItem(i).cast("double"))): _*).as("mxs"))
      .head()
    val mns = stats.getSeq[Double](0); val mxs = stats.getSeq[Double](1)
    // worst-case per-dim quantization error is half a step
    val worstMse = (0 until 64).map { i =>
      val s = (mxs(i) - mns(i)) / 254.0; (s / 2) * (s / 2)
    }.sum / 64.0
    val rows = CacheScope.withScope { q("embedding_quantize").collect() }
    assert(rows.length == e.count())
    rows.foreach { r =>
      val qsum = r.getLong(1)
      assert(qsum >= 0 && qsum <= 254L * 64)
      // rounding the final mse at 6dp can only add 1e-6 slack
      assert(r.getDouble(3) <= worstMse + 1e-6)
    }
  }

  test("dedup_keep_best keeps exactly the max-n_chars doc per cluster") {
    val rows = CacheScope.withScope { q("dedup_keep_best").collect() }
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byCluster = rows.groupBy(_._2)
    val chars = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (_, members) =>
      val kept = members.filter(_._3)
      assert(kept.length == 1)
      // the kept member attains the cluster's max n_chars, min doc_id tiebreak
      val best = members.minBy(m => (-chars(m._1), m._1))
      assert(kept.head._1 == best._1)
    }
    // every doc appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("source_stats totals reconcile with the raw table") {
    val rows = CacheScope.withScope { q("source_stats").collect() }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val expectDocs = docs.count()
    assert(rows.map(_.getLong(1)).sum == expectDocs)
    val expectChars = docs.agg(sum("n_chars")).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == expectChars)
    rows.foreach { r =>
      val mean = r.getDouble(5)
      assert(math.abs(mean - r.getLong(2).toDouble / r.getLong(1)) < 1e-5)
    }
  }

  test("dsir_score: target-domain docs outweigh out-of-domain docs on average") {
    val rows = CacheScope.withScope { q("dsir_score").collect() }
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (en, rest) = rows.partition { case (id, _) => langs(id) == "en" }
    assert(en.nonEmpty && rest.nonEmpty)
    val mEn = en.values.sum / en.size
    val mRest = rest.values.sum / rest.size
    // the importance weight exists to rank target-domain data up
    assert(mEn > mRest, s"mean en=$mEn should exceed mean rest=$mRest")
  }

  test("logreg_step moves weights toward separating labels on a separable corpus") {
    // word "alpha" (bucket 23) appears only in positive (long) docs,
    // "bravo" (bucket 26) only in negative (short) docs; start weights
    // are ~0 so p ≈ 0.5 everywhere — one gradient step must RAISE the
    // positive-evidence weight and LOWER the negative-evidence one
    val long = ("alpha " * 60).trim  // n_chars >= 300 → y = 1
    val short = ("bravo " * 10).trim // n_chars < 300  → y = 0
    val docs = Seq(
      (1L, long, long.length.toLong), (2L, long, long.length.toLong),
      (3L, short, short.length.toLong), (4L, short, short.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_lr_spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CacheScope.withScope {
      SparkEntry.queries("logreg_step")(spark, dir).collect()
    }.map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    def startW(j: Int): Long = j.toLong * 2654435761L % 1001L - 500L
    val (gradPos, newPos) = out(23)
    val (gradNeg, newNeg) = out(26)
    assert(gradPos < 0 && newPos > startW(23),
      s"positive-evidence weight must rise: grad=$gradPos new=$newPos")
    assert(gradNeg > 0 && newNeg < startW(26),
      s"negative-evidence weight must fall: grad=$gradNeg new=$newNeg")
  }
}
