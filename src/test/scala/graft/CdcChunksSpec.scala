package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Content-defined chunking: boundary rule, reassembly, and the
  * property fixed-width windows lack — insertion-shift invariance
  * (a shared passage chunks identically past the first
  * content-defined boundary, so edits ahead of it don't hide the
  * duplication). */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(docs: Seq[(Long, String)], mask: Int): Map[Long, Seq[String]] = {
    // recover chunk text by replaying the grouping on the driver from
    // the words + the same md5-derived boundary rule
    def bound(w: String): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4)
        .foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      h % mask == 0
    }
    docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val chunks = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      for (w <- ws) {
        chunks.last += w
        if (bound(w)) chunks += scala.collection.mutable.ArrayBuffer.empty[String]
      }
      id -> chunks.filter(_.nonEmpty).map(_.mkString(" ")).toSeq
    }.toMap
  }

  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "prefix words inserted here the quick brown fox jumps over the lazy dog again and again today",
    3L -> "totally unrelated content with no shared passages at all whatsoever")

  test("cdcChunks matches a driver replay of the boundary rule") {
    val out = Dedup.cdcChunks(corpus.toDF("doc_id", "text"), "doc_id", "text",
        mask = 4)
      .orderBy("doc_id", "grp")
      .select("doc_id", "h").as[(Long, String)].collect()
    val expect = chunksOf(corpus, 4).toSeq.sortBy(_._1).flatMap {
      case (id, cs) => cs.map(c => (id, c))
    }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq == expect.map { case (id, c) => (id, md5hex(c)) })
  }

  test("shared suffix chunks identically despite an inserted prefix") {
    val m = chunksOf(corpus, 4)
    // past the first boundary after the insertion point, doc 1 and
    // doc 2 must produce identical chunks (the CDC property)
    val shared = m(1L).toSet intersect m(2L).toSet
    assert(shared.nonEmpty,
      s"expected shared chunks, got\n${m(1L)}\nvs\n${m(2L)}")
    // and the distributed dup report finds them
    val dup = Dedup.cdcDupChunks(corpus.toDF("doc_id", "text"), "doc_id",
        "text", mask = 4, minDocs = 2L)
      .orderBy("h").as[(String, Long, Long, Long)].collect()
    assert(dup.length == shared.size)
    assert(dup.forall { case (_, nOcc, nDocs, keep) =>
      nOcc == 2 && nDocs == 2 && keep == 1L })
  }
}
