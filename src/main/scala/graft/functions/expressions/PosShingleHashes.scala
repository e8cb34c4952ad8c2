package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_pos_shingles(text, k): xxhash64 of every POSITIONAL k-word
  * window of a space-separated document, in order (index i = window
  * starting at word i), duplicates kept. Documents shorter than k
  * words yield an EMPTY array (they contain no k-window).
  *
  * The substring-span dedup operator needs per-position window hashes
  * — `graft_shingles` dedups and drops positions, and the
  * declarative `transform(sequence(...), i -> xxhash64(concat_ws(
  * slice(...))))` formulation it replaces is an interpreted
  * higher-order chain that re-slices and re-concatenates O(k) words
  * per position. Here each window is hashed directly over its
  * contiguous byte range in the source (the words are already
  * space-joined — the ShingleArray trick), one tight pass per row
  * inside whole-stage codegen, no per-window allocation at all.
  * Only hash EQUALITY matters downstream (cross-doc duplicate
  * detection), so the hash needn't match any other formulation.
  */
case class PosShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"graft_pos_shingles window must be >= 1, got $k")

  override def prettyName: String = "graft_pos_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pos_shingles expects string, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PosShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PosShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PosShingleHashes {

  def compute(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    var n = 1
    var i = 0
    while (i < nBytes) { if (bytes(i) == 0x20) n += 1; i += 1 }
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n + 1) // sentinel: starts(n) = nBytes+1
    var w = 1
    i = 0
    while (i < nBytes) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(n) = nBytes + 1
    val out = new Array[Any](n - k + 1)
    w = 0
    while (w <= n - k) {
      // window w = the contiguous byte range from word w's start to
      // the byte before word w+k's separator — hashed in place
      val from = starts(w)
      val until = starts(w + k) - 1
      out(w) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, 42L)
      w += 1
    }
    new GenericArrayData(out)
  }
}
