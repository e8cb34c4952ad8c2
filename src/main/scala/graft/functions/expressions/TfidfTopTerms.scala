package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** graft_tfidf_topk(text): the k highest-TF-IDF terms of one document
  * against a BROADCAST document-frequency dictionary — output
  * array<struct<term: string, micro: long>> in rank order (score
  * desc, term asc; micro = ⌊tf·N/df·10⁶+0.5⌋, the exact integer
  * ranking key).
  *
  * TF-IDF scoring is per-row once df is available, and the df table
  * is Heaps'-law bounded (≈√ token stream — vocabulary, not corpus,
  * sized), so it rides as a torrent-broadcast dictionary inside the
  * expression (the SketchProbes pattern: tasks serialize only the
  * handle). The whole query then needs ZERO exchanges: tokenize +
  * count + score + bounded top-k in one byte scan per document,
  * replacing the per-token explode → (doc,term) agg → df join →
  * row_number window chain. An unbounded vocabulary (no Heaps bound,
  * e.g. opaque IDs) switches the consumer back to the exploded
  * broadcast/partitioned df join — this expression is the common
  * dictionary-shaped fast path.
  *
  * Tokenization and arithmetic replay the exploded form exactly:
  * split on 0x20 dropping empties (TermCounts semantics), score
  * micros computed with the identical IEEE double chain, ties on the
  * binary UTF8 term order (Spark's string ordering).
  */
case class TfidfTopTerms(child: Expression,
    df: Broadcast[java.util.HashMap[UTF8String, java.lang.Long]],
    nDocs: Long, k: Int) extends UnaryExpression {

  require(k >= 1, s"graft_tfidf_topk k must be >= 1, got $k")

  override def prettyName: String = "graft_tfidf_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("micro", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TfidfTopTerms.compute(input.asInstanceOf[UTF8String], df.value, nDocs, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("dfBc", df,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.expressions.TfidfTopTerms.compute($c,
         |  (java.util.HashMap) $b.value(), ${nDocs}L, $k)""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TfidfTopTerms {

  def compute(text: UTF8String,
      df: java.util.HashMap[UTF8String, java.lang.Long],
      nDocs: Long, k: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var start = 0
    var i = 0
    while (i <= nBytes) {
      if (i == nBytes || bytes(i) == 0x20) {
        if (i > start) {
          val term = UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, start, i))
          val slot = counts.computeIfAbsent(term, _ => new Array[Long](1))
          slot(0) += 1L
        }
        start = i + 1
      }
      i += 1
    }
    // bounded (micro desc, term asc) top-k by insertion into k slots
    val topTerm = new Array[UTF8String](k)
    val topMicro = new Array[Long](k)
    var size = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val term = e.getKey
      val dfv = df.getOrDefault(term, java.lang.Long.valueOf(1L)).longValue()
      val micro = math.floor(
        (e.getValue()(0) * nDocs).toDouble / dfv.toDouble * 1000000 + 0.5)
        .toLong
      // find insertion point: better = larger micro, or equal micro
      // and binary-smaller term
      var pos = size
      while (pos > 0 && (micro > topMicro(pos - 1) ||
          (micro == topMicro(pos - 1) &&
            term.compareTo(topTerm(pos - 1)) < 0))) pos -= 1
      if (pos < k) {
        val last = math.min(size, k - 1)
        var j = last
        while (j > pos) {
          topTerm(j) = topTerm(j - 1); topMicro(j) = topMicro(j - 1); j -= 1
        }
        topTerm(pos) = term
        topMicro(pos) = micro
        if (size < k) size += 1
      }
    }
    val out = new Array[Any](size)
    i = 0
    while (i < size) { out(i) = InternalRow(topTerm(i), topMicro(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column form over a string column. */
  def of(c: Column,
      df: Broadcast[java.util.HashMap[UTF8String, java.lang.Long]],
      nDocs: Long, k: Int): Column =
    GraftColumnBridge.column(
      TfidfTopTerms(GraftColumnBridge.expression(c), df, nDocs, k))
}
