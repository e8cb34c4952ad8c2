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
}
