package graft.sources.zarr

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.Inflater

/** Pure-JVM reader for zarr v2 directory stores — written against the
  * public zarr v2 storage specification
  * (https://zarr.readthedocs.io/en/stable/spec/v2.html). scida's
  * second native format (reference: src/scida/io/_base.py:267
  * `ZarrLoader`): a store directory holds `.zgroup`, per-array
  * subdirectories with `.zarray` metadata + `.zattrs` attributes, and
  * chunk files named `i` / `i.j` (C-order indices, `.` separator).
  *
  * Supported subset (documented, checked, errors are informative):
  * dtypes `<f8 <f4 <i8 <i4 <i2 |i1 |u1 <u2 <u4 <u8` (plus `>` big-
  * endian), compressor `null` or `zlib`/`gzip` (java.util.zip —
  * zarr-python's default blosc needs a native lib and fails fast with
  * a clear message), `order: "C"`, no filters, chunking along axis 0
  * only (inner dimensions unchunked — the tabular layout scida
  * snapshots use). Edge chunks are full-sized per spec; MISSING chunk
  * files materialize as fill_value.
  */
object ZarrStore {

  /** Parsed `.zarray` metadata for one array. */
  final case class ArrayMeta(
      name: String,
      dir: String,
      shape: Seq[Long],
      chunks: Seq[Long],
      dtypeStr: String,
      compressor: Option[String], // "zlib" | "gzip" (id string) | None
      compressorLevel: Int,
      fillValue: Double) {
    def rows: Long = if (shape.isEmpty) 1L else shape.head
    def rowWidth: Int = shape.drop(1).product.toInt max 1
    def chunkRows: Long = if (chunks.isEmpty) 1L else chunks.head
    def elemSize: Int = dtypeStr.drop(2).toInt
    def littleEndian: Boolean = dtypeStr.head != '>'
    /** 'f' float, 'i' signed int, 'u' unsigned int. */
    def kind: Char = dtypeStr.charAt(1)
  }

  final case class Store(path: String, arrays: Seq[ArrayMeta],
      attrs: Map[String, Map[String, Any]])

  /** Save-target safety (reference: src/scida/interface.py:311-320 —
    * scida's save() refuses to clobber a directory it did not write):
    * an EXISTING, NON-EMPTY target must already be a zarr group/array
    * (.zgroup or .zarray present); an empty dir or a fresh path is
    * fine. A regular-file target is always an error (zarr stores are
    * directories). Shared by ZarrSave (distributed) and ZarrWriter
    * (driver-side). */
  def assertSaveTarget(root: File): Unit = {
    if (!root.exists()) return
    require(root.isDirectory,
      s"${root.getPath} exists and is not a directory — zarr stores are directories")
    val entries = root.listFiles()
    if (entries != null && entries.nonEmpty) {
      val isZarr = new File(root, ".zgroup").exists() ||
        new File(root, ".zarray").exists()
      require(isZarr, s"Directory '${root.getPath}' exists and is not a " +
        "zarr group. Refusing to overwrite for safety.")
    }
  }

  /** Container view of an opened store — the zarr analogue of an
    * HDF5 particle-type group: arrays under `group/` with the prefix
    * stripped, per-array attrs re-keyed, other containers' arrays
    * dropped. Enables multi-container zarr stores (a catalog holding
    * Group/ and Subhalo/ tables of different lengths) to load one
    * container per DataFrame, exactly like the chunked-HDF5 path. */
  def subGroup(st: Store, group: String): Store = {
    val pfx = group.stripSuffix("/") + "/"
    val arrays = st.arrays.filter(_.name.startsWith(pfx))
      .map(a => a.copy(name = a.name.stripPrefix(pfx)))
    require(arrays.nonEmpty,
      s"no arrays under group '$group' in ${st.path} " +
        s"(have ${st.arrays.map(_.name).mkString(", ")})")
    val attrs = st.attrs.collect {
      case ("/", v) => "/" -> v // root (header) attrs stay visible
      case (k, v) if k.startsWith("/" + pfx) =>
        ("/" + k.stripPrefix("/" + pfx)) -> v
    }
    Store(st.path, arrays, attrs)
  }

  /** Distinct top-level containers among a store's nested arrays. */
  def groupsOf(st: Store): Seq[String] =
    st.arrays.map(_.name).filter(_.contains("/"))
      .map(_.split('/').head).distinct.sorted

  /** Open a store directory: every descendant directory containing
    * `.zarray` is an array; `.zattrs` files become attrs keyed by
    * store-relative path ("/" for root, "/name" per array). */
  def open(path: String): Store = {
    val root = new File(path)
    require(root.isDirectory, s"no such zarr store: $path")
    require(new File(root, ".zgroup").exists() || new File(root, ".zarray").exists(),
      s"$path is not a zarr store (no .zgroup/.zarray)")
    // consolidated metadata (.zmetadata, the zarr v2 convention zarr's
    // consolidate_metadata() writes): ONE file read instead of a
    // directory walk + one JSON read per array — the difference
    // between O(1) and O(arrays) metadata I/O when planning over
    // object storage. Falls back to the walk on any parse problem;
    // per the convention, a present .zmetadata is authoritative
    // (graft's writers reconsolidate on every write).
    openConsolidated(root, path).getOrElse(openWalk(root, path))
  }

  private def openConsolidated(root: File, path: String): Option[Store] = {
    val zm = new File(root, ".zmetadata")
    if (!zm.isFile) return None
    try {
      val j = MiniJson.parse(Files.readString(zm.toPath))
        .asInstanceOf[Map[String, Any]]
      require(j("zarr_consolidated_format").asInstanceOf[Double].toInt == 1)
      val meta = j("metadata").asInstanceOf[Map[String, Any]]
      // order by path SEGMENTS — exactly the walk's DFS with sorted
      // children (a flat string sort would misplace names containing
      // characters below '/', e.g. "flux-err" vs "flux"); a root-level
      // array appears under the bare ".zarray" key
      import scala.math.Ordering.Implicits.seqOrdering
      val arrayKeys = meta.keys
        .filter(k => k == ".zarray" || k.endsWith("/.zarray")).toSeq
        .sortBy(_.stripSuffix(".zarray").stripSuffix("/").split('/').toIndexedSeq)
      val arrays = arrayKeys.map { k =>
        val rel = k.stripSuffix(".zarray").stripSuffix("/")
        val name = if (rel.isEmpty) root.getName else rel
        val dir = if (rel.isEmpty) root else new File(root, rel)
        parseArrayMetaJson(name, dir.getPath,
          meta(k).asInstanceOf[Map[String, Any]])
      }
      val attrs = meta.collect {
        case (".zattrs", v) => "/" -> v.asInstanceOf[Map[String, Any]]
        case (k, v) if k.endsWith("/.zattrs") =>
          s"/${k.stripSuffix("/.zattrs")}" -> v.asInstanceOf[Map[String, Any]]
      }
      Some(Store(path, arrays, attrs))
    } catch { case _: Exception => None }
  }

  private def openWalk(root: File, path: String): Store = {
    def walk(dir: File, rel: String): Seq[(String, File)] = {
      val self = if (new File(dir, ".zarray").exists()) Seq(rel -> dir) else Nil
      self ++ dir.listFiles().filter(_.isDirectory).sortBy(_.getName)
        .flatMap(d => walk(d, s"$rel/${d.getName}".replaceAll("^//", "/")))
    }
    val arrays = walk(root, "").map { case (rel, dir) =>
      parseArrayMeta(if (rel.isEmpty) root.getName else rel.stripPrefix("/"), dir)
    }
    val attrDirs = (root -> "/") +: arrays.map(a => new File(a.dir) -> s"/${a.name}")
    val attrs = attrDirs.flatMap { case (dir, key) =>
      val f = new File(dir, ".zattrs")
      if (f.exists())
        Some(key -> MiniJson.parse(Files.readString(f.toPath))
          .asInstanceOf[Map[String, Any]])
      else None
    }.toMap
    Store(path, arrays, attrs)
  }

  /** Write `.zmetadata` for a store by embedding every metadata file
    * verbatim — zarr.consolidate_metadata() for this store layout.
    * Call after any metadata-changing write (graft's writers do). */
  def consolidate(path: String): Unit = {
    val root = new File(path)
    def collect(dir: File, rel: String): Seq[(String, File)] =
      Seq(".zgroup", ".zarray", ".zattrs").flatMap { n =>
        val f = new File(dir, n)
        if (f.isFile) Some((if (rel.isEmpty) n else s"$rel/$n") -> f) else None
      } ++ dir.listFiles().filter(_.isDirectory).sortBy(_.getName)
        .flatMap(d => collect(d, if (rel.isEmpty) d.getName else s"$rel/${d.getName}"))
    val entries = collect(root, "").map { case (k, f) =>
      // escape the key (array names are arbitrary directory names)
      "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\": " +
        Files.readString(f.toPath)
    }
    // atomic: a crash mid-write must not leave a torn .zmetadata that
    // silently disables the one-read open for every future reader
    val tmp = File.createTempFile(".zmetadata", ".tmp", root)
    Files.writeString(tmp.toPath,
      entries.mkString(
        "{\"zarr_consolidated_format\": 1, \"metadata\": {", ", ", "}}"))
    if (!tmp.renameTo(new File(root, ".zmetadata"))) tmp.delete()
  }

  private def parseArrayMeta(name: String, dir: File): ArrayMeta =
    parseArrayMetaJson(name, dir.getPath,
      MiniJson.parse(Files.readString(new File(dir, ".zarray").toPath))
        .asInstanceOf[Map[String, Any]])

  private def parseArrayMetaJson(name: String, dirPath: String,
      j: Map[String, Any]): ArrayMeta = {
    require(j("zarr_format").asInstanceOf[Double].toInt == 2,
      s"$name: only zarr v2 stores are supported")
    require(j.getOrElse("order", "C") == "C",
      s"$name: only C-order zarr arrays are supported")
    require(j.getOrElse("filters", null) == null ||
      j("filters").asInstanceOf[Seq[Any]].isEmpty,
      s"$name: zarr filters are not supported")
    val shape = j("shape").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toLong)
    val chunks = j("chunks").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toLong)
    require(shape.size == chunks.size && shape.size <= 2,
      s"$name: only 1-D/2-D arrays are supported (shape ${shape.mkString("x")})")
    shape.drop(1).zip(chunks.drop(1)).foreach { case (s, c) =>
      require(s == c, s"$name: inner dimensions must be unchunked (shape $s, chunk $c)")
    }
    val (comp, lvl) = j.getOrElse("compressor", null) match {
      case null => (None, 0)
      case m: Map[String, Any] @unchecked =>
        val id = m("id").asInstanceOf[String]
        require(id == "zlib" || id == "gzip",
          s"$name: unsupported zarr compressor '$id' (supported: null, zlib, gzip; " +
            "blosc requires a native library)")
        (Some(id), m.getOrElse("level", 1.0).asInstanceOf[Double].toInt)
      case x => sys.error(s"$name: malformed compressor $x")
    }
    val dtype = j("dtype").asInstanceOf[String]
    require(dtype.length == 3 && "<>|".contains(dtype.head) &&
      "fiu".contains(dtype.charAt(1)),
      s"$name: unsupported dtype '$dtype'")
    val fill = j.getOrElse("fill_value", null) match {
      case null => 0.0
      case d: Double => d
      case _ => 0.0
    }
    ArrayMeta(name, dirPath, shape, chunks, dtype, comp, lvl, fill)
  }

  /** Read rows [rowStart, rowStart+nRows) of an array into a single
    * native-order buffer of nRows×rowWidth elements. Chunk files are
    * each decompressed at most once; chunk-aligned callers (the
    * DataSource partitions) touch exactly one chunk. */
  def readRows(meta: ArrayMeta, rowStart: Long, nRows: Int): ByteBuffer = {
    val es = meta.elemSize
    val w = meta.rowWidth
    val out = ByteBuffer.allocate(nRows * w * es)
      .order(if (meta.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val cr = meta.chunkRows
    var row = rowStart
    val end = rowStart + nRows
    while (row < end) {
      val chunkIdx = row / cr
      val inChunk = row - chunkIdx * cr
      val take = math.min(end - row, cr - inChunk).toInt
      val chunk = readChunk(meta, chunkIdx)
      out.put(chunk, (inChunk * w * es).toInt, take * w * es)
      row += take
    }
    out.flip()
    out
  }

  /** One decompressed chunk (full-sized per spec; missing file =>
    * fill_value). */
  def readChunk(meta: ArrayMeta, chunkIdx: Long): Array[Byte] = {
    val name = if (meta.shape.size <= 1) s"$chunkIdx" else s"$chunkIdx.0"
    val f = Paths.get(meta.dir, name)
    val size = (meta.chunkRows * meta.rowWidth * meta.elemSize).toInt
    if (!Files.exists(f)) return fillChunk(meta, size)
    val raw = Files.readAllBytes(f)
    meta.compressor match {
      case None => raw
      case Some(_) => inflate(raw, size)
    }
  }

  private def fillChunk(meta: ArrayMeta, size: Int): Array[Byte] = {
    val out = new Array[Byte](size)
    if (meta.fillValue != 0.0) {
      val one = ByteBuffer.allocate(meta.elemSize)
        .order(if (meta.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      meta.kind match {
        case 'f' => if (meta.elemSize == 4) one.putFloat(meta.fillValue.toFloat)
          else one.putDouble(meta.fillValue)
        case _ => meta.elemSize match {
          case 1 => one.put(meta.fillValue.toByte)
          case 2 => one.putShort(meta.fillValue.toShort)
          case 4 => one.putInt(meta.fillValue.toInt)
          case 8 => one.putLong(meta.fillValue.toLong)
        }
      }
      var i = 0
      while (i < size) { out(i) = one.get(i % meta.elemSize); i += 1 }
    }
    out
  }

  private def inflate(raw: Array[Byte], expected: Int): Array[Byte] = {
    // zlib and gzip ids both wrap DEFLATE; zlib has a 2-byte header
    // the Inflater handles natively, gzip needs GZIPInputStream
    if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(raw))
      val out = in.readAllBytes()
      require(out.length == expected,
        s"gzip chunk inflated to ${out.length} bytes, expected $expected")
      out
    } else {
      val inf = new Inflater()
      inf.setInput(raw)
      val out = new Array[Byte](expected)
      val n = inf.inflate(out)
      require(inf.finished() && n == expected,
        s"zlib chunk inflated to $n bytes, expected $expected")
      inf.end()
      out
    }
  }
}

/** Minimal JSON parser for zarr metadata files (objects, arrays,
  * strings, numbers, booleans, null — the entire grammar `.zarray` /
  * `.zattrs` use). Self-contained so the store reader has no
  * dependency surface beyond the JDK. */
object MiniJson {
  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos"); pos += 1
    }
    def value(): Any = {
      ws()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.startsWith(word, pos), s"bad literal at $pos"); pos += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (s.charAt(pos) == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws(); val k = str(); ws(); expect(':')
        b += k -> value(); ws()
        if (s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): Seq[Any] = {
      expect('['); ws()
      if (s.charAt(pos) == ']') { pos += 1; return Nil }
      val b = Seq.newBuilder[Any]
      var done = false
      while (!done) {
        b += value(); ws()
        if (s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case o => sb += o
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def num(): Double = {
      val start = pos
      while (!eof && ("+-.eE0123456789".indexOf(s.charAt(pos)) >= 0)) pos += 1
      s.substring(start, pos).toDouble
    }
  }
}
