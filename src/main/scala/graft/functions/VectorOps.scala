package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with`, `aggregate`,
  * `transform`) — no UDFs, so whole-stage codegen applies and the ops
  * run map-side with zero shuffle.
  *
  * Re-expresses the vector arithmetic scida delegates to dask/numpy
  * element-wise kernels (reference: src/scida/fields.py derived-field
  * arithmetic) for the embedding-similarity operators.
  *
  * Determinism note: products are taken in double precision and summed
  * strictly left-to-right (the `aggregate` fold order), so results are
  * bit-identical across partitionings and cluster sizes — required for
  * the DuckDB oracle hash-compare.
  */
object VectorOps {

  /** Sum of an array<double> column, strict left-to-right fold. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float/double array columns, accumulated in
    * double. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd forms (graft.functions.expressions, registered
    * by GraftExtensions): one tight primitive loop instead of boxed
    * per-element lambda calls. Numerically identical to dot/cosine
    * (double widening, left-to-right accumulation). Require a session
    * built with GraftExtensions — all GraftSession sessions are. */
  def dotFast(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosineFast(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Euclidean distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(arraySum(zip_with(a, b, (x, y) => {
      val dxy = x.cast("double") - y.cast("double"); dxy * dxy
    })))

  /** Round at `digits` decimal places using explicit IEEE ops
    * (floor(x*s + 0.5)/s) so Spark and the DuckDB oracle — whose
    * round() implementations disagree on double ties — produce
    * bit-identical results. Half-up toward +inf for negatives on BOTH
    * engines, hence comparable. */
  def roundAt(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * lit(s) + lit(0.5)) / lit(s)
  }
}
