package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Native graft_dot / graft_cosine must agree bit-for-bit with the
  * higher-order-function forms (same widening and fold order), across
  * float and double arrays, nulls, and length mismatches. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot == HOF dot on float arrays, bitwise") {
    val df = Seq((Seq(1.0f, 2.5f, -3.25f), Seq(0.5f, 4.0f, 2.0f)))
      .toDF("a", "b")
    val (fast, slow) = df.select(
      VectorOps.dotFast(col("a"), col("b")),
      VectorOps.dot(col("a"), col("b"))).as[(Double, Double)].head()
    assert(java.lang.Double.doubleToLongBits(fast) ==
      java.lang.Double.doubleToLongBits(slow))
  }

  test("graft_nearest_cells: p=1 equals graft_nearest_centroid; ordered, distinct, in-range") {
    val e = graft.sources.Tables.embeddings(spark, sfDir).limit(200)
    val cents = typedLit(Seq(
      Seq.fill(64)(0.1), Seq.fill(64)(-0.1),
      (0 until 64).map(i => math.sin(i.toDouble)),
      (0 until 64).map(i => math.cos(i.toDouble))))
    val rows = e.select(
      call_function("graft_nearest_centroid", col("embedding"), cents).as("nc"),
      call_function("graft_nearest_cells", col("embedding"), cents, lit(1)).as("p1"),
      call_function("graft_nearest_cells", col("embedding"), cents, lit(3)).as("p3"))
      .as[(Int, Seq[Int], Seq[Int])].collect()
    rows.foreach { case (nc, p1, p3) =>
      assert(p1 == Seq(nc), "p=1 must equal the single-cell assignment")
      assert(p3.head == nc, "nearest-first ordering")
      assert(p3.distinct == p3 && p3.forall(c => c >= 0 && c < 4))
      assert(p3.length == 3)
    }
    // p > k clamps to k cells
    val clamped = e.limit(1).select(
      call_function("graft_nearest_cells", col("embedding"), cents, lit(9)))
      .as[Seq[Int]].head()
    assert(clamped.sorted == Seq(0, 1, 2, 3))
    // corrupt vectors (NaN components → every distance NaN) still get
    // a deterministic, valid assignment instead of crashing the task
    val bad = Seq(Seq.fill(64)(Double.NaN)).toDF("embedding")
    val badCells = bad.select(
      call_function("graft_nearest_cells", col("embedding"), cents, lit(2)))
      .as[Seq[Int]].head()
    assert(badCells == Seq(0, 1), "NaN rows take lowest-index cells")
  }

  test("graft_cosine == HOF cosine on testdata embeddings, bitwise") {
    val e = graft.sources.Tables.embeddings(spark, sfDir).limit(50)
    val pairs = e.crossJoin(e.select(col("embedding").as("e2"), col("vec_id").as("v2")))
      .filter(col("vec_id") < col("v2"))
      .select(
        VectorOps.cosineFast(col("embedding"), col("e2")).as("fast"),
        VectorOps.cosine(col("embedding"), col("e2")).as("slow"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (f, s) =>
      assert(java.lang.Double.doubleToLongBits(f) ==
        java.lang.Double.doubleToLongBits(s), s"$f != $s")
    }
  }

  test("null element and length mismatch return null (HOF parity)") {
    val df = Seq(
      (Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)),
      (Seq[java.lang.Float](1.0f), Seq[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    val r = df.select(VectorOps.dotFast(col("a"), col("b")))
      .collect().map(_.isNullAt(0))
    assert(r.forall(identity))
  }

  test("works through SQL text too") {
    graft.sources.Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_v")
    val n = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_v LIMIT 5")
      .collect()
    assert(n.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }
}
