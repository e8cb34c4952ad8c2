package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_shingles(text, k): distinct k-word shingles of a
  * space-separated document, in first-occurrence order; documents
  * shorter than k words yield their whole text as the single shingle.
  *
  * Semantics are exactly the `split(text,' ')` + windowed-slice-zip +
  * `array_distinct` formulation this replaces (and the DuckDB oracle's
  * string_split CTE): split at EVERY 0x20 byte keeping empty tokens,
  * window joined by single spaces. It exists because higher-order
  * functions (zip_with) never whole-stage-codegen and CollapseProject
  * re-evaluates the split subtree per consumer slice — shingling is
  * the map-side anchor of the whole dedup family (reference:
  * cbyrohl/scida has no text path; this serves SURVEY §2's
  * LLM-data-pipeline rows), so it gets one tight loop per row inside
  * codegen instead of five interpreted array passes.
  */
case class ShingleArray(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"graft_shingles window must be >= 1, got $k")

  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.ShingleArray.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {

  /** One pass: find word boundaries (0x20 never occurs inside a UTF-8
    * multi-byte sequence, so a byte scan is exact), then emit each
    * k-window as one contiguous byte slice (the source is already
    * space-joined), deduplicated in insertion order. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes // at most one copy of the row's text
    val nBytes = bytes.length
    // word start offsets (byte-based; 0x20 never occurs inside a UTF-8
    // multi-byte sequence); words keep empty tokens, as regex-split on
    // " " with limit -1 does
    var n = 1
    var i = 0
    while (i < nBytes) { if (bytes(i) == 0x20) n += 1; i += 1 }
    if (n < k) return new GenericArrayData(Array[Any](text.clone()))
    val starts = new Array[Int](n + 1) // sentinel: starts(n) = nBytes+1
    var w = 1
    i = 0
    while (i < nBytes) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(n) = nBytes + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    w = 0
    while (w <= n - k) {
      // window w spans words w..w+k-1 = the byte range from
      // starts(w) to the byte before word w+k's separator — already
      // space-joined in the source, so no per-word concat is needed
      val from = starts(w)
      val until = starts(w + k) - 1
      seen.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until)))
      w += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
