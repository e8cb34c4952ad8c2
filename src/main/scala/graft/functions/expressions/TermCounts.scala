package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_term_counts(text): per-document term frequencies in one byte
  * scan — output array<struct<term: string, tf: long>> over the
  * space-separated tokens of `text`, empty tokens dropped, distinct
  * terms in first-occurrence order (deterministic).
  *
  * Semantics are exactly `explode(split(text, ' '))` filtered on
  * length > 0 then counted per (doc, term) — but computed inside the
  * row, so the per-TOKEN exploded frame and its corpus-wide
  * (doc, term) aggregation exchange disappear: downstream sees the
  * already-reduced distinct-terms frame (Heaps'-law sized, a fraction
  * of the token stream). The tf-weighting anchor of the TF-IDF /
  * BM25 family, same rationale as ShingleArray for the dedup family
  * (0x20 never occurs inside a UTF-8 multi-byte sequence, so the byte
  * scan is exact; lowercasing stays the caller's `lower()`).
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_term_counts"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.TermCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {

  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var start = 0
    var i = 0
    while (i <= nBytes) {
      if (i == nBytes || bytes(i) == 0x20) {
        if (i > start) { // empty tokens dropped (length > 0 filter)
          val term = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, start, i))
          val slot = counts.computeIfAbsent(term, _ => new Array[Long](1))
          slot(0) += 1L
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = InternalRow(e.getKey, e.getValue()(0))
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Column form over a string column. */
  def of(c: Column): Column =
    GraftColumnBridge.column(TermCounts(GraftColumnBridge.expression(c)))
}
