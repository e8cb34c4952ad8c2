package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryMeta
import graft.sources.Tables

/** Multimodal-column query (SURVEY.md §2): opaque binary payloads +
  * typed metadata extraction through the real mapPartitions batch
  * plumbing (decode stubbed deterministically — see BinaryMeta). The
  * oracle replays the same deterministic fake-decode arithmetic on
  * octet_length in SQL, checking the whole pipeline end to end.
  */
object MultimodalQueries {

  def defs: Map[String, QueryDef] = Map(
    "multimodal_meta" -> QueryDef.sql(
      (s, d) => BinaryMeta.decodeMeta(
        BinaryMeta.withPayload(Tables.documents(s, d), "text"),
        "doc_id", "payload")
        .toDF()
        .select(col("id"), col("n_bytes"), col("width"), col("height"), col("format"))
        .orderBy("id"),
      """SELECT doc_id AS id,
        |  octet_length(encode(text)) AS n_bytes,
        |  octet_length(encode(text)) % 640 AS width,
        |  (octet_length(encode(text)) * 7) % 480 AS height,
        |  CASE (octet_length(encode(text)) % 3)
        |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS format
        |FROM documents ORDER BY id""".stripMargin)
  )
}
