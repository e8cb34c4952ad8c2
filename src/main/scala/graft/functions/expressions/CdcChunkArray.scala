package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_cdc_chunks(text): content-defined chunking (FastCDC/rsync at
  * word granularity) in ONE pass per document — returns the chunk
  * texts in order. A word ENDS a chunk when the integer value of the
  * first 8 md5 hex digits of the word is ≡ 0 mod `mask`; the chunk
  * index (via posexplode downstream) equals the prefix-sum group id
  * of the window formulation this replaces, which paid a word-level
  * explode, a per-doc window shuffle, and a (doc, grp) regroup with
  * collect_list — three passes over every word in the corpus for a
  * per-row computation.
  *
  * Bit-compatible with the declarative form: the same
  * Pattern.quote(" ") split with limit -1 (empty words kept), the
  * same md5 (MessageDigest) the engines' md5() computes, big-endian
  * first 4 bytes as the 32-bit word hash. Codegen'd (one static call
  * inside whole-stage fusion) so the scan stage it sits in fuses like
  * its sibling native expressions; the md5-per-word cost dominates
  * either way.
  */
case class CdcChunkArray(child: Expression, mask: Int)
    extends UnaryExpression {

  require(mask >= 2, s"mask must be >= 2, got $mask")

  override def prettyName: String = "graft_cdc_chunks"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkArray.compute(input.asInstanceOf[UTF8String], mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.CdcChunkArray.compute($c, $mask)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkArray {

  def compute(input: UTF8String, mask: Int): ArrayData = {
    val words = input.toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val chunks = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val cur = new StringBuilder
    var n = 0
    var i = 0
    while (i < words.length) {
      if (n > 0) cur.append(' ')
      cur.append(words(i))
      n += 1
      md.reset()
      val h = md.digest(words(i).getBytes("UTF-8"))
      val w32 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      if (w32 % mask == 0) {
        chunks += UTF8String.fromString(cur.toString)
        cur.clear(); n = 0
      }
      i += 1
    }
    if (n > 0) chunks += UTF8String.fromString(cur.toString)
    new GenericArrayData(chunks.toArray[Any])
  }

  def of(text: Column, mask: Int): Column =
    GraftColumnBridge.column(
      CdcChunkArray(GraftColumnBridge.expression(text), mask))
}
