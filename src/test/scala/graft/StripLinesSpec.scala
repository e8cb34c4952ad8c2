package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** graft_strip_lines (the plan-literal map-side strip) vs the
  * DataFrame fallback (explode → broadcast anti-join → doc-key
  * regroup): outputs must be IDENTICAL — including kept empty lines,
  * all-boilerplate docs dropping out, tab/space trim semantics, and
  * unicode lowercase normalization. */
class StripLinesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "NAV MENU\nreal content one\nfooter\nmore text"),
    (2L, "nav menu \nreal content two\n footer\n"),   // trailing empty kept
    (3L, "Nav Menu\nfooter"),                          // all boiler -> dropped
    (4L, "\tnav menu\nkeep: tab-prefixed norm differs"), // \t NOT trimmed
    (5L, "ÜNICODE Boiler\nsurvivor"),                   // unicode lowercase
    (6L, "a\n\nb"),                                     // interior empty kept
    (7L, "unique only"))
  private val boilerLines = Seq("nav menu", "footer", "ünicode boiler")

  private def run(viaExpr: Boolean): Seq[(Long, String)] = {
    val d = docs.toDF("doc_id", "text")
    val b = boilerLines.toDF("__norm")
    val out =
      if (viaExpr) {
        // literal path: what Dedup.stripLines picks under the probe cap
        val set = boilerLines.toSet
        d.select(col("doc_id"),
            graft.functions.expressions.StripLines.of(col("text"), "\n", set)
              .as("text"))
          .filter(col("text").isNotNull)
      } else
        d.select(col("doc_id"),
            posexplode(split(col("text"), java.util.regex.Pattern.quote("\n"))))
          .toDF("doc_id", "pos", "line")
          .withColumn("__norm", lower(trim(col("line"))))
          .transform(l => Dedup.stripLineTable(l, "doc_id", "text", b, "\n"))
    out.orderBy("doc_id").as[(Long, String)].collect().toSeq
  }

  test("expression path == anti-join fallback on adversarial docs") {
    val a = run(viaExpr = true)
    val b = run(viaExpr = false)
    assert(a == b)
    assert(!a.exists(_._1 == 3L), "all-boilerplate doc must drop out")
    assert(a.find(_._1 == 4L).get._2.contains("\tnav menu"),
      "tab-prefixed line must survive (trim is 0x20-only)")
    assert(a.find(_._1 == 2L).get._2.endsWith("\n"),
      "trailing empty line must be kept")
  }

  test("stripLines picks the literal path and matches stripBoilerplateLines") {
    val d = docs.toDF("doc_id", "text")
    val full = Dedup.stripBoilerplateLines(d, "doc_id", "text", minDocs = 99L)
    // minDocs 99 -> empty boiler set -> everything survives unchanged
    assert(full.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      docs.sortBy(_._1))
  }
}
