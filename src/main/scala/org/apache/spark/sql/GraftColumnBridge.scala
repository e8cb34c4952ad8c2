package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to sql-private Column↔Expression conversion (Spark 4's
  * `classic.ExpressionUtils` is `private[sql]`). Needed for graft
  * expressions whose constructor takes a RUNTIME object — the
  * broadcast-sketch probes (`graft.functions.expressions.SketchProbes`)
  * hold a `Broadcast[BloomFilter|CountMinSketch]` handle, which cannot
  * ride the literal-only FunctionRegistry path the other graft
  * expressions use (GraftExtensions). The bytecode is public; only the
  * Scala-level access modifier gates it, hence this one-file shim in
  * the sql package — the standard extension technique, kept to exactly
  * two forwarders.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
