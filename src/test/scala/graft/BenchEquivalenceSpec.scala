package graft

/** Pins the contract behind `QueryDef.benchBuild` for the queries
  * whose steady-state bench variant must compute the SAME result as
  * the gated build (artifact-backed steady states — the bench skips
  * artifact construction, never changes semantics). The sketch/gate
  * family is deliberately absent: there the bench intentionally times
  * the operator ALONE while Verify computes an exact verdict beside
  * it, so outputs differ by design. */
class BenchEquivalenceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (q <- Seq("lsh_bucket_stats", "text_compress_ratio",
      "dedup_clusters_incremental", "bpe_tokens", "dedup_lines",
      "logreg_predict", "perplexity_bucket", "ann_delta_search",
      "sample_diverse")) {
    test(s"$q: steady-state bench output == gated build output") {
      // build FIRST: it persists the artifacts the bench variant reads
      val built = rows(SparkEntry.queries(q)(spark, sf))
      val benched = rows(SparkEntry.benchQueries(q)(spark, sf))
      assert(built.nonEmpty)
      assert(built == benched,
        s"bench variant diverged from the gated build for $q")
    }
  }
}
