package graft.sources.fits

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Pure-JVM FITS reader — written against the public FITS 4.0
  * standard (IAUFWG): a file is a sequence of HDUs, each a header of
  * 2880-byte blocks of 80-char ASCII cards followed by 2880-padded
  * data. scida loads the first BINTABLE extension as a row-chunked
  * record array (reference: src/scida/io/_base.py:105 FITS loader,
  * src/scida/io/fits.py:15 fitsrecords_to_daskarrays) and the primary
  * header as metadata (`load_metadata`, io/_base.py:134) — this
  * reader exposes exactly that surface.
  *
  * BINTABLE support: column types L (logical), B (u8), I (i16),
  * J (i32), K (i64), E (f32), D (f64), A (char string), each with a
  * repeat count; big-endian row-major records, PCOUNT heap ignored
  * (no variable-length arrays).
  */
object FitsReader {

  val BlockSize = 2880
  val CardSize = 80

  /** One parsed header: raw keyword → string value, plus HDU offsets. */
  final case class Header(cards: Map[String, String], headerStart: Long,
      dataStart: Long, dataBytes: Long) {
    def str(k: String): Option[String] = cards.get(k)
    def long(k: String): Option[Long] = cards.get(k).flatMap(_.toLongOption)
    def int(k: String): Option[Int] = cards.get(k).flatMap(_.toIntOption)
  }

  /** One BINTABLE column: FITS type char, repeat count, byte offset
    * within the row record; `unit` is the TUNITn physical-unit
    * keyword when present (the FITS standard's column unit — feeds
    * graft's unit mixin like HDF5 dataset attrs do). */
  final case class ColDef(name: String, tchar: Char, repeat: Int, offset: Int,
      unit: Option[String] = None) {
    def elemSize: Int = FitsReader.elemSize(tchar)
  }

  final case class BinTable(header: Header, rows: Long, rowBytes: Int,
      cols: Seq[ColDef])

  def elemSize(t: Char): Int = t match {
    case 'L' | 'B' | 'A' => 1
    case 'I' => 2
    case 'J' | 'E' => 4
    case 'K' | 'D' => 8
    case other => sys.error(s"unsupported FITS column type '$other'")
  }

  /** Per-JVM memo keyed by (path, mtime, size) — Load.dataset reads
    * headers for the primary-HDU metadata AND the BINTABLE geometry,
    * and the DataSource parses again at scan planning; header blocks
    * are pure metadata, so parse each file version once. */
  private val headerMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), Seq[Header]]()

  /** Parse all headers (HDU map) without reading data. */
  def headers(path: String): Seq[Header] = {
    val f = new java.io.File(path)
    headerMemo.computeIfAbsent(
      (f.getCanonicalPath, f.lastModified(), f.length()),
      _ => parseHeaders(path))
  }

  private def parseHeaders(path: String): Seq[Header] = {
    val size = Files.size(Paths.get(path))
    val in = new RandomAccessFile(path, "r")
    try {
      var pos = 0L
      val out = Seq.newBuilder[Header]
      while (pos < size) {
        val h = readHeader(in, pos)
        out += h
        pos = h.dataStart + pad(h.dataBytes)
      }
      out.result()
    } finally in.close()
  }

  private def pad(n: Long): Long = ((n + BlockSize - 1) / BlockSize) * BlockSize

  private def readHeader(in: RandomAccessFile, start: Long): Header = {
    val cards = Map.newBuilder[String, String]
    var blockStart = start
    var ended = false
    while (!ended) {
      val block = new Array[Byte](BlockSize)
      in.seek(blockStart)
      in.readFully(block)
      var i = 0
      while (i < BlockSize && !ended) {
        val card = new String(block, i, CardSize, StandardCharsets.US_ASCII)
        val key = card.substring(0, 8).trim
        if (key == "END") ended = true
        else if (key.nonEmpty && card.length > 10 && card.charAt(8) == '=') {
          // FITS 4.0 card value: for QUOTED strings the comment begins
          // only after the closing quote ('' escapes an apostrophe),
          // so '/' inside quotes is DATA — km/s, Msun/yr, erg/s are
          // routine TUNIT values; for unquoted values '/' starts the
          // comment
          val body = card.substring(10)
          val trimmed = body.dropWhile(_ == ' ')
          val v =
            if (trimmed.startsWith("'")) {
              val sb = new StringBuilder
              var j = 1
              var closed = false
              while (j < trimmed.length && !closed) {
                val ch = trimmed.charAt(j)
                if (ch == '\'') {
                  if (j + 1 < trimmed.length && trimmed.charAt(j + 1) == '\'') {
                    sb.append('\''); j += 2 // '' escape
                  } else { closed = true; j += 1 }
                } else { sb.append(ch); j += 1 }
              }
              sb.result().trim
            } else trimmed.split('/').head.trim
          cards += key -> v
        }
        i += CardSize
      }
      blockStart += BlockSize
    }
    val c = cards.result()
    val dataBytes: Long = {
      val naxis = c.get("NAXIS").flatMap(_.toIntOption).getOrElse(0)
      if (naxis == 0) 0L
      else {
        val dims = (1 to naxis).map(i =>
          c.get(s"NAXIS$i").flatMap(_.toLongOption).getOrElse(0L))
        val bitpix = math.abs(c.get("BITPIX").flatMap(_.toIntOption).getOrElse(8))
        val pcount = c.get("PCOUNT").flatMap(_.toLongOption).getOrElse(0L)
        dims.product * (bitpix / 8) + pcount
      }
    }
    Header(c, start, blockStart, dataBytes)
  }

  /** Primary-HDU header as metadata — scida load_metadata. */
  def primaryHeader(path: String): Map[String, String] = headers(path).head.cards

  /** The first BINTABLE extension — scida's `ext = 1` record array. */
  def binTable(path: String): BinTable = {
    val h = headers(path).find(_.str("XTENSION").contains("BINTABLE"))
      .getOrElse(sys.error(s"no BINTABLE extension in $path"))
    val nFields = h.int("TFIELDS").getOrElse(0)
    val rowBytes = h.int("NAXIS1").getOrElse(sys.error(s"$path: NAXIS1 missing"))
    val rows = h.long("NAXIS2").getOrElse(sys.error(s"$path: NAXIS2 missing"))
    var offset = 0
    val cols = (1 to nFields).map { i =>
      val tform = h.str(s"TFORM$i").getOrElse(sys.error(s"$path: TFORM$i missing"))
      val name = h.str(s"TTYPE$i").getOrElse(s"col$i")
      val (digits, rest) = tform.span(_.isDigit)
      val repeat = if (digits.isEmpty) 1 else digits.toInt
      val tchar = rest.headOption.getOrElse(sys.error(s"$path: empty TFORM$i"))
      val c = ColDef(name, tchar, repeat, offset, h.str(s"TUNIT$i"))
      offset += repeat * elemSize(tchar)
      c
    }
    require(offset == rowBytes,
      s"$path: TFORM row width $offset != NAXIS1 $rowBytes")
    BinTable(h, rows, rowBytes, cols)
  }

  /** Raw bytes of rows [rowStart, rowStart+n) — one contiguous read;
    * big-endian, row-major, exactly as stored. */
  def readRows(path: String, t: BinTable, rowStart: Long, n: Int): ByteBuffer = {
    val in = new RandomAccessFile(path, "r")
    try {
      val buf = new Array[Byte](n * t.rowBytes)
      in.seek(t.header.dataStart + rowStart * t.rowBytes)
      in.readFully(buf)
      ByteBuffer.wrap(buf) // FITS data is big-endian, the buffer default
    } finally in.close()
  }
}
