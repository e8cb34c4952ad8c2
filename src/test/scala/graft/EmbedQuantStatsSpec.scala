package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.EmbedQuantStats

/** graft_embed_quant_stats vs the higher-order-fold form it replaced
  * (transform codes + aggregate sum + zip_with dot + error fold): the
  * two must be BIT-identical — same subtract/divide/floor sequence,
  * same left-to-right error accumulation — including the degenerate
  * constant-dimension (mx == mn) branch. */
class EmbedQuantStatsSpec extends SparkSpec {
  import spark.implicits._

  private val n = 8 // dimension count for the spec fixtures

  private def viaFolds(rows: Seq[(Long, Seq[Float])],
      mns: Seq[Double], mxs: Seq[Double]): Seq[(Long, Long, Long, Double)] =
    rows.toDF("vec_id", "embedding")
      .withColumn("mns", typedLit(mns)).withColumn("mxs", typedLit(mxs))
      .withColumn("codes", expr(s"""transform(sequence(0, ${n - 1}), i ->
        CAST(floor(CASE WHEN mxs[i] = mns[i] THEN CAST(0.0 AS DOUBLE)
          ELSE (CAST(embedding[i] AS DOUBLE) - mns[i])
            / ((mxs[i] - mns[i]) / CAST(254.0 AS DOUBLE)) END
          + CAST(0.5 AS DOUBLE)) AS BIGINT))"""))
      .select(col("vec_id"),
        expr("aggregate(codes, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("q_sum"),
        expr(s"""aggregate(zip_with(codes, sequence(1, $n),
          (c, i) -> c * CAST(i AS BIGINT)),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("q_dot"),
        expr(s"""aggregate(sequence(0, ${n - 1}), CAST(0.0 AS DOUBLE), (acc, i) ->
          acc + (CASE WHEN mxs[i] = mns[i] THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(embedding[i] AS DOUBLE)
              - (mns[i] + CAST(codes[i] AS DOUBLE) * ((mxs[i] - mns[i]) / CAST(254.0 AS DOUBLE))) END)
            * (CASE WHEN mxs[i] = mns[i] THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(embedding[i] AS DOUBLE)
              - (mns[i] + CAST(codes[i] AS DOUBLE) * ((mxs[i] - mns[i]) / CAST(254.0 AS DOUBLE))) END))
          / CAST($n AS DOUBLE)""").as("recon_mse"))
      .orderBy("vec_id")
      .as[(Long, Long, Long, Double)].collect().toSeq

  private def viaExpr(rows: Seq[(Long, Seq[Float])],
      mns: Seq[Double], mxs: Seq[Double]): Seq[(Long, Long, Long, Double)] =
    rows.toDF("vec_id", "embedding")
      .withColumn("mns", typedLit(mns)).withColumn("mxs", typedLit(mxs))
      .select(col("vec_id"),
        EmbedQuantStats.of(col("embedding"), col("mns"), col("mxs")).as("qs"))
      .select(col("vec_id"), col("qs.q_sum"), col("qs.q_dot"),
        col("qs.recon_mse"))
      .orderBy("vec_id")
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("bit-identical to the fold form, incl. constant dimensions") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map(i =>
      (i, Seq.fill(n)(rnd.nextFloat() * 10f - 5f)))
    // dimension 3 constant (mx == mn) to hit the degenerate branch
    val vals = rows.map(_._2)
    val frozen = rows.map { case (i, v) => (i, v.updated(3, 1.25f)) }
    val mns = (0 until n).map(j => frozen.map(_._2(j).toDouble).min)
    val mxs = (0 until n).map(j => frozen.map(_._2(j).toDouble).max)
    assert(mns(3) == mxs(3))
    val a = viaExpr(frozen, mns, mxs)
    val b = viaFolds(frozen, mns, mxs)
    assert(a == b)
  }

  test("NaN stats dimension matches the fold form (SQL NaN = NaN is TRUE)") {
    // a NaN in any vector makes that dimension's min/max both NaN;
    // the SQL fold's mxs[i] = mns[i] test is TRUE for a NaN pair
    // (Spark NaN equality), so it takes the degenerate branch — the
    // expression must too, not leak NaN into recon_mse via Java !=
    val rows = Seq(
      (1L, Seq(Float.NaN, 1f, 2f, 3f, 4f, 5f, 6f, 7f)),
      (2L, Seq(0.5f, 1f, 2f, 3f, 4f, 5f, 6f, 7f)))
    val mns = Double.NaN +: Seq.fill(n - 1)(-10.0)
    val mxs = Double.NaN +: Seq.fill(n - 1)(10.0)
    val a = viaExpr(rows, mns, mxs)
    val b = viaFolds(rows, mns, mxs)
    assert(a == b)
    assert(!a.exists(_._4.isNaN), "recon_mse must not be NaN")
  }

  test("double-element vectors work too") {
    val rows = Seq((1L, Seq(0.5f, 1.5f, -2f, 3f, 0f, 1f, 2f, -1f)))
    val mns = Seq.fill(n)(-5.0); val mxs = Seq.fill(n)(5.0)
    val viaDouble = rows.map { case (i, v) => (i, v.map(_.toDouble)) }
      .toDF("vec_id", "embedding")
      .withColumn("mns", typedLit(mns)).withColumn("mxs", typedLit(mxs))
      .select(col("vec_id"),
        EmbedQuantStats.of(col("embedding"), col("mns"), col("mxs")).as("qs"))
      .select(col("vec_id"), col("qs.q_sum"), col("qs.q_dot"), col("qs.recon_mse"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(viaDouble == viaExpr(rows, mns, mxs))
  }
}
