package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** graft_topk_rows(struct, k): the k smallest struct values of the
  * group in ascending order — per-group top-k as an ALGEBRAIC
  * aggregate.
  *
  * The naive per-group top-k (`row_number().over(Window.partitionBy
  * (group))` + filter) shuffles every row of the table into one
  * reducer per group — with few groups that is a handful of tasks no
  * matter the cluster size. As a TypedImperativeAggregate the bounded
  * k-row buffer participates in partial aggregation: each map task
  * reduces its input to <= k rows per group BEFORE the exchange, the
  * shuffle carries O(tasks * groups * k) rows, and merge is a bounded
  * k-way trim. Same contract scida meets with sorted per-halo slices
  * (reference: src/scida/customs/arepo/dataset.py:789 grouped ops).
  *
  * Descending order: negate (or invert) the sort component inside the
  * struct — ascending struct order is the single canonical form.
  */
case class TopKRows(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[UnsafeRow]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType)
      .asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val unsafeOrdering: Ordering[UnsafeRow] =
    ordering.on((r: UnsafeRow) => (r: InternalRow))
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def prettyName: String = "graft_topk_rows"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a struct input")
    else if (!kExpr.foldable || kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a positive literal k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ArrayBuffer[UnsafeRow] =
    new ArrayBuffer[UnsafeRow](k + 1)

  /** Buffer invariant: sorted ascending once it holds k rows (kept
    * unsorted below k — cheap inserts while filling). */
  override def update(buf: ArrayBuffer[UnsafeRow],
      input: InternalRow): ArrayBuffer[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.length < k) {
        buf += toUnsafe(row).copy()
        if (buf.length == k) buf.sortInPlace()(unsafeOrdering)
      } else if (ordering.lt(row, buf(k - 1))) {
        buf(k - 1) = toUnsafe(row).copy()
        // restore order: bubble the new last element into place
        var i = k - 1
        while (i > 0 && ordering.lt(buf(i), buf(i - 1))) {
          val t = buf(i); buf(i) = buf(i - 1); buf(i - 1) = t; i -= 1
        }
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[UnsafeRow],
      other: ArrayBuffer[UnsafeRow]): ArrayBuffer[UnsafeRow] = {
    buf ++= other
    buf.sortInPlace()(unsafeOrdering)
    if (buf.length > k) buf.takeInPlace(k) else buf
  }

  override def eval(buf: ArrayBuffer[UnsafeRow]): Any = {
    val sorted = buf.toArray.sorted(unsafeOrdering)
    new GenericArrayData(sorted.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ArrayBuffer[UnsafeRow]): Array[Byte] = {
    var total = 4
    buf.foreach(r => total += 4 + r.getSizeInBytes)
    val out = new Array[Byte](total)
    Platform.putInt(out, Platform.BYTE_ARRAY_OFFSET, buf.length)
    var pos = 4
    buf.foreach { r =>
      Platform.putInt(out, Platform.BYTE_ARRAY_OFFSET + pos, r.getSizeInBytes)
      r.writeToMemory(out, Platform.BYTE_ARRAY_OFFSET + pos + 4)
      pos += 4 + r.getSizeInBytes
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UnsafeRow] = {
    val n = Platform.getInt(bytes, Platform.BYTE_ARRAY_OFFSET)
    val buf = new ArrayBuffer[UnsafeRow](n + 1)
    var pos = 4
    var i = 0
    while (i < n) {
      val len = Platform.getInt(bytes, Platform.BYTE_ARRAY_OFFSET + pos)
      val row = new UnsafeRow(structType.size)
      row.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + pos + 4, len)
      buf += row
      pos += 4 + len
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
