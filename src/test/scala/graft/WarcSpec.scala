package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.warc.{Warc, WarcWriter}

/** WARC ingestion — public WARC 1.0 record framing, plain and
  * per-record-gzip archives, one file per task.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val recs = Seq(
    ("warcinfo", "", "2024-01-01T00:00:00Z", "software: graft-test"),
    ("response", "http://a.example/1", "2024-01-01T00:00:01Z",
      "the quick brown fox and the lazy dog"),
    ("request", "http://a.example/1", "2024-01-01T00:00:01Z", "GET /1"),
    ("response", "http://a.example/2", "2024-01-01T00:00:02Z",
      "a second document of the corpus"),
    ("conversion", "http://a.example/3", "2024-01-01T00:00:03Z",
      "extracted plain text"))

  test("plain and gzip archives parse identically, record-bounded") {
    val dir = Files.createTempDirectory("graft_warc").toString
    WarcWriter.write(s"$dir/a.warc", recs)
    WarcWriter.write(s"$dir/b.warc.gz", recs)
    val plain = Warc.parseFile(s"$dir/a.warc").toSeq
    val gz = Warc.parseFile(s"$dir/b.warc.gz").toSeq
    assert(plain.map(r => (r.warc_type, r.url, r.content)) ==
      gz.map(r => (r.warc_type, r.url, r.content)))
    assert(plain.size == 5)
    assert(plain(1).content.contains("quick brown fox"))
  }

  test("load: one task per file, response/conversion records only") {
    val dir = Files.createTempDirectory("graft_warc_load").toString
    WarcWriter.write(s"$dir/a.warc", recs)
    WarcWriter.write(s"$dir/b.warc.gz", recs)
    val df = Warc.load(spark, dir)
    assert(df.rdd.getNumPartitions == 2)
    // warcinfo/request filtered; 3 payload records per file
    assert(df.count() == 6)
    assert(df.select("warc_type").distinct().as[String].collect().toSet ==
      Set("response", "conversion"))
    // feeds the text pipeline directly
    val tokens = df.select(sum(graft.functions.TextOps.wsTokenCount(col("content"))))
      .head().getLong(0)
    assert(tokens == 2L * (8 + 6 + 3))
  }
}
