package graft.queries

import org.apache.spark.sql.functions._
import graft.ann.{Ann, Ivf, Pq}
import graft.sources.Tables

/** Similarity-search family over `embeddings` (SURVEY.md §2). The
  * query vector is the corpus vector with vec_id = 0 (joined in, so
  * the query needs no literals and the oracle can express the same).
  */
object AnnQueries {

  def defs: Map[String, QueryDef] = Map(
    // --- exact cosine top-k vs query vector (TakeOrderedAndProject) ---
    "ann_bruteforce" -> QueryDef.sql(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_vec"))
        Ann.bruteForceTopK(
          e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q)),
          "vec_id", "embedding", col("q_vec"), k = 10)
      },
      """SELECT e.vec_id,
        |  floor((
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, 65),
        |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, 65),
        |         i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))))
        |    *1000000 + 0.5)/1000000 AS cos
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id != 0
        |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin),

    // --- IVF ANN: k-means coarse quantizer (fixed seed), probe the 4
    // nearest of 16 cells, exact re-rank — rows-only; spec asserts
    // exhaustive-probe == brute force and pruning at small nProbe ---
    "ann_ivf" -> QueryDef.rowsOnly(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        val (indexed, centers) = Ivf.build(e.filter(col("vec_id") =!= 0),
          "vec_id", "embedding", nCells = 16)
        Ivf.topK(indexed, centers, "vec_id", "embedding", q, k = 10, nProbe = 4)
      }),

    // --- product quantization: 8x16 codebooks (32x compression), ADC
    // code scan → refine-100 exact re-rank — rows-only; PqSpec pins
    // the lossless regime exactly and recall on this corpus ---
    "ann_pq" -> QueryDef.rowsOnly(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        val corpus = e.filter(col("vec_id") =!= 0)
        val cb = Pq.train(corpus, "vec_id", "embedding", m = 8, k = 16)
        val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
        Pq.topK(codes, corpus, cb, "vec_id", "embedding", q,
          k = 10, refine = 100)
      }),

    // --- IVF-PQ composite (IVFADC): coarse cells prune the scan,
    // residual-PQ codes compress it, exact re-rank on refine
    // survivors — rows-only; PqSpec pins exhaustive==bruteforce and
    // recall at bounded probe ---
    "ann_ivfpq" -> QueryDef.rowsOnly(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        val corpus = e.filter(col("vec_id") =!= 0)
        val (codes, index) = graft.ann.IvfPq.build(corpus,
          "vec_id", "embedding", nCells = 16, m = 8, k = 16)
        graft.ann.IvfPq.topK(codes, index, corpus, "vec_id", "embedding",
          q, kTop = 10, nProbe = 4, refine = 100)
      }),

    // --- random-hyperplane LSH bucketed ANN — rows-only; spec
    // measures recall vs brute force and candidate-set pruning ---
    "ann_lsh" -> QueryDef.rowsOnly(
      (s, d) => {
        val spark = s
        val e = Tables.embeddings(spark, d)
        // the query vector as plain doubles (tiny driver fetch of ONE
        // row — the query itself, not corpus data)
        val q = e.filter(col("vec_id") === 0).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        Ann.lshTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          q, k = 10, dims = 64, tables = 4, planes = 4)
      })
  )
}
