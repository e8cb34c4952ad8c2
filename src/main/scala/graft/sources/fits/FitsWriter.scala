package graft.sources.fits

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal FITS writer (public FITS 4.0 standard): an empty primary
  * HDU carrying metadata cards plus one BINTABLE extension. Driver-
  * side fixture/metadata-scale writer, like `Hdf5Writer`/`ZarrWriter`
  * — bulk at-rest data stays parquet.
  */
object FitsWriter {

  sealed trait Col { def name: String; def rows: Int; def tform: String }
  final case class D(name: String, data: Array[Double]) extends Col {
    def rows: Int = data.length; def tform = "1D"
  }
  final case class E(name: String, data: Array[Float]) extends Col {
    def rows: Int = data.length; def tform = "1E"
  }
  final case class J(name: String, data: Array[Int]) extends Col {
    def rows: Int = data.length; def tform = "1J"
  }
  final case class K(name: String, data: Array[Long]) extends Col {
    def rows: Int = data.length; def tform = "1K"
  }
  /** Fixed-width character column (padded/truncated to `width`). */
  final case class A(name: String, data: Array[String], width: Int) extends Col {
    def rows: Int = data.length; def tform = s"${width}A"
  }
  /** Fixed-repeat vector column (flattened row-major input). */
  final case class Dv(name: String, data: Array[Double], repeat: Int) extends Col {
    def rows: Int = data.length / repeat; def tform = s"${repeat}D"
  }

  def write(path: String, cols: Seq[Col],
      primaryCards: Seq[(String, String)] = Nil,
      units: Map[String, String] = Map.empty): Unit = {
    require(cols.nonEmpty && cols.map(_.rows).distinct.size == 1,
      "columns must be non-empty and agree on row count")
    val rows = cols.head.rows
    val rowBytes = cols.map(width).sum
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try {
      // primary HDU: no data, metadata cards
      writeHeader(out,
        Seq("SIMPLE" -> "T", "BITPIX" -> "8", "NAXIS" -> "0") ++
          primaryCards ++ Seq("EXTEND" -> "T"))
      // BINTABLE header
      val tableCards = Seq(
        "XTENSION" -> "'BINTABLE'", "BITPIX" -> "8", "NAXIS" -> "2",
        "NAXIS1" -> rowBytes.toString, "NAXIS2" -> rows.toString,
        "PCOUNT" -> "0", "GCOUNT" -> "1", "TFIELDS" -> cols.size.toString) ++
        cols.zipWithIndex.flatMap { case (c, i) =>
          Seq(s"TTYPE${i + 1}" -> s"'${c.name}'", s"TFORM${i + 1}" -> s"'${c.tform}'") ++
            units.get(c.name).map { u =>
              // FITS string cards: '' escapes an apostrophe; the value
              // must fit the fixed 80-byte card (key+'= ' leave 68)
              val esc = u.replace("'", "''")
              require(esc.length <= 68,
                s"TUNIT for '${c.name}' too long for a FITS card: $u")
              s"TUNIT${i + 1}" -> s"'$esc'"
            }
        }
      writeHeader(out, tableCards)
      // data: big-endian row-major records, 2880-padded
      val buf = ByteBuffer.allocate(rowBytes) // big-endian by default
      var written = 0L
      (0 until rows).foreach { r =>
        buf.clear()
        cols.foreach {
          case D(_, d) => buf.putDouble(d(r))
          case E(_, d) => buf.putFloat(d(r))
          case J(_, d) => buf.putInt(d(r))
          case K(_, d) => buf.putLong(d(r))
          case A(_, d, w) =>
            val b = d(r).getBytes(StandardCharsets.US_ASCII)
            (0 until w).foreach(i => buf.put(if (i < b.length) b(i) else ' '.toByte))
          case Dv(_, d, rep) =>
            (0 until rep).foreach(k => buf.putDouble(d(r * rep + k)))
        }
        out.write(buf.array(), 0, rowBytes)
        written += rowBytes
      }
      padBlock(out, written)
    } finally out.close()
  }

  private def width(c: Col): Int = c match {
    case _: D => 8; case _: E => 4; case _: J => 4; case _: K => 8
    case a: A => a.width
    case v: Dv => v.repeat * 8
  }

  private def writeHeader(out: BufferedOutputStream,
      cards: Seq[(String, String)]): Unit = {
    val sb = new StringBuilder
    cards.foreach { case (k, v) =>
      val quoted = v.startsWith("'")
      // value field right-justified to col 30 for fixed-format values,
      // left-justified after the quote for strings — both standard
      val card =
        if (quoted) f"$k%-8s= $v%-70s"
        else f"$k%-8s= $v%20s${" " * 50}"
      sb.append(card.substring(0, FitsReader.CardSize))
    }
    sb.append(f"${"END"}%-80s")
    while (sb.length % FitsReader.BlockSize != 0) sb.append(" " * 80)
    out.write(sb.toString.getBytes(StandardCharsets.US_ASCII))
  }

  private def padBlock(out: BufferedOutputStream, written: Long): Unit = {
    val rem = (written % FitsReader.BlockSize).toInt
    if (rem != 0) out.write(new Array[Byte](FitsReader.BlockSize - rem))
  }
}
