package graft.sources

import java.nio.ByteBuffer
import org.apache.spark.sql.execution.vectorized.WritableColumnVector

/** Shared vectorized-fill kernels for the graft columnar sources
  * (HDF5, zarr): both readers hold each projected dataset's partition
  * slice as one flat ByteBuffer of row-major elements; these fillers
  * copy a run of rows straight into Spark `WritableColumnVector`s —
  * tight primitive loops, no per-value boxing, no per-row dispatch —
  * so the scan feeds whole-stage codegen through the columnar path
  * (`ColumnarToRow`) instead of materializing a GenericInternalRow
  * per row.
  *
  * Element (row, comp) lives at buffer index (row*width + comp);
  * unsigned types widen to the next signed Spark type (u8 stays Long
  * and fails fast on values >= 2^63, matching the row readers).
  */
object ColumnarFill {

  /** Bind a filler: (srcRowStart, n) writes vector rows [0, n). */
  def filler(vec: WritableColumnVector, buf: ByteBuffer, kind: Char, size: Int,
      width: Int, comp: Int, label: String): (Int, Int) => Unit = {
    val w = width
    (kind, size) match {
      case ('f', 4) => (s, n) => {
        var i = 0; while (i < n) { vec.putFloat(i, buf.getFloat(((s + i) * w + comp) * 4)); i += 1 }
      }
      case ('f', 8) => (s, n) => {
        var i = 0; while (i < n) { vec.putDouble(i, buf.getDouble(((s + i) * w + comp) * 8)); i += 1 }
      }
      case ('i', 1) => (s, n) => {
        var i = 0; while (i < n) { vec.putByte(i, buf.get((s + i) * w + comp)); i += 1 }
      }
      case ('i', 2) => (s, n) => {
        var i = 0; while (i < n) { vec.putShort(i, buf.getShort(((s + i) * w + comp) * 2)); i += 1 }
      }
      case ('i', 4) => (s, n) => {
        var i = 0; while (i < n) { vec.putInt(i, buf.getInt(((s + i) * w + comp) * 4)); i += 1 }
      }
      case ('i', 8) => (s, n) => {
        var i = 0; while (i < n) { vec.putLong(i, buf.getLong(((s + i) * w + comp) * 8)); i += 1 }
      }
      case ('u', 1) => (s, n) => {
        var i = 0; while (i < n) { vec.putShort(i, (buf.get((s + i) * w + comp) & 0xff).toShort); i += 1 }
      }
      case ('u', 2) => (s, n) => {
        var i = 0; while (i < n) { vec.putInt(i, buf.getShort(((s + i) * w + comp) * 2) & 0xffff); i += 1 }
      }
      case ('u', 4) => (s, n) => {
        var i = 0; while (i < n) { vec.putLong(i, buf.getInt(((s + i) * w + comp) * 4) & 0xffffffffL); i += 1 }
      }
      case ('u', 8) => (s, n) => {
        var i = 0
        while (i < n) {
          val v = buf.getLong(((s + i) * w + comp) * 8)
          if (v < 0) sys.error(s"u8 value >= 2^63 in $label does not fit LongType")
          vec.putLong(i, v); i += 1
        }
      }
      case t => sys.error(s"unsupported columnar dtype $t for $label")
    }
  }

  /** Filler for a synthetic ascending long id column (row_id). */
  def idFiller(vec: WritableColumnVector, globalStart: Long): (Int, Int) => Unit =
    (s, n) => {
      var i = 0; while (i < n) { vec.putLong(i, globalStart + s + i); i += 1 }
    }
}
