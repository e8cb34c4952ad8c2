package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import graft.queries.TextQueries

/** The tfidf df-dictionary vocabulary guard (DiscreteStats
  * discipline): the broadcast dictionary's driver collect is a
  * limit-probe that FAILS FAST past the bound — naming the
  * term-partitioned join fallback — instead of OOMing the driver at
  * 100 TB vocabulary scale; and the fallback itself is hash-exact
  * against the broadcast-expression path at two SFs, so switching
  * paths never changes answers. */
class TfidfVocabGuardSpec extends SparkSpec {

  test("vocabulary past the bound fails fast and names the fallback") {
    val e = intercept[IllegalArgumentException] {
      TextQueries.tfidfDfBcGuarded(spark, sfDir, maxVocab = 10)
    }
    assert(e.getMessage.contains("tfidfTopTermsJoined"))
    assert(e.getMessage.contains("10"))
  }

  test("join fallback == broadcast expression path, both SFs") {
    for (d <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val bc = SparkEntry.queries("tfidf_topterms")(spark, d)
        .collect().map(_.toString).sorted.toSeq
      val joined = TextQueries.tfidfTopTermsJoined(spark, d)
        .collect().map(_.toString).sorted.toSeq
      assert(bc.nonEmpty && joined == bc,
        s"fallback must match the broadcast path row-for-row at $d")
    }
  }

  test("fallback plan: df never leaves the cluster (term-keyed join)") {
    val plan = TextQueries.tfidfTopTermsJoined(spark, sfDir)
      .queryExecution.optimizedPlan
    // the dictionary rides a term-keyed equi-join, not a collected
    // plan literal: exactly one Join whose keys include the term column
    val joins = plan.collect { case j: Join => j }
    assert(joins.size == 1, s"expected the tf⋈df join, got $joins")
    assert(joins.head.condition.exists(_.references.exists(
      _.name == "term")), "join must key on the term column")
    // and no CollectLimit / driver probe anywhere in the fallback
    assert(!plan.toString.contains("GlobalLimit"),
      "fallback must not collect the vocabulary to the driver")
  }
}
