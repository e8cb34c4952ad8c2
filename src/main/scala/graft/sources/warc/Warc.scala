package graft.sources.warc

import java.io.{BufferedInputStream, FileInputStream, InputStream}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** WARC ingestion — the web-archive format training corpora ship in
  * (ISO 28500 / the public WARC 1.0 specification, the Common Crawl
  * container): a file is a concatenation of records, each
  * `WARC/1.0\r\n` + header lines + `\r\n` + Content-Length payload
  * bytes + `\r\n\r\n`; `.warc.gz` files are per-record gzip members
  * concatenated, which `GZIPInputStream` decompresses end-to-end.
  *
  * Scale shape: one FILE per task — the standard Common Crawl
  * parallelism unit (archives are ~1 GB each; a crawl is ~64k files,
  * so a 1000-executor cluster keeps 64 waves busy with zero driver
  * data motion). Each task streams its file record-by-record: memory
  * is bounded by one record, never the file. Parsed records land as
  * (file, record type, url, date, content) rows feeding the text/
  * dedup pipeline directly.
  */
object Warc {

  final case class Record(file: String, warc_type: String, url: String,
      date: String, content: String)

  /** Load every `.warc`/`.warc.gz` under `path` (or a single file) as
    * a DataFrame, one task per file. `responseOnly` keeps only
    * `response`/`conversion` records — the payload-bearing kinds a
    * text pipeline wants. */
  def load(spark: SparkSession, path: String,
      responseOnly: Boolean = true): DataFrame = {
    import spark.implicits._
    val files = listFiles(path)
    require(files.nonEmpty, s"no .warc/.warc.gz files under $path")
    val ds: Dataset[Record] = files.toDS()
      .repartition(files.size) // one file per task
      .flatMap(f => parseFile(f))
    val all = ds.toDF()
    if (responseOnly)
      all.filter(org.apache.spark.sql.functions.col("warc_type")
        .isin("response", "conversion"))
    else all
  }

  def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Seq(f.getPath)
    else f.listFiles().toSeq.filter(_.isFile).map(_.getPath)
      .filter(p => p.endsWith(".warc") || p.endsWith(".warc.gz")).sorted
  }

  /** Stream-parse one archive: record-bounded memory. */
  def parseFile(path: String): Iterator[Record] = {
    val raw: InputStream = new BufferedInputStream(new FileInputStream(path))
    val in =
      if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
      else raw
    new Iterator[Record] {
      private var nextRec: Record = advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Record = {
        val r = nextRec; nextRec = advance(); r
      }
      @annotation.tailrec
      private def advance(): Record = {
        val headers = readHeaders(in)
        if (headers == null) { in.close(); null }
        else {
          val len = headers.getOrElse("content-length",
            sys.error(s"$path: WARC record without Content-Length")).trim.toInt
          val payload = in.readNBytes(len)
          require(payload.length == len, s"$path: truncated WARC payload")
          val rec = Record(path,
            headers.getOrElse("warc-type", "unknown"),
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("warc-date", ""),
            new String(payload, StandardCharsets.UTF_8))
          if (rec.warc_type == "unknown" && rec.url.isEmpty && len == 0)
            advance() // tolerate stray empty blocks
          else rec
        }
      }
    }
  }

  /** Read one record's header block (through the blank line); null at
    * EOF. Record-separator blank lines BEFORE the version line are
    * skipped; the blank line ENDING the header block terminates the
    * loop (an empty string, never conflated with payload bytes).
    * Header names are case-insensitive per spec. */
  private def readHeaders(in: InputStream): Map[String, String] = {
    var first = readLine(in)
    while (first != null && first.isEmpty) first = readLine(in)
    if (first == null) return null
    require(first.startsWith("WARC/"),
      s"expected WARC version line, got '${first.take(40)}'")
    val b = Map.newBuilder[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) b += line.substring(0, i).toLowerCase -> line.substring(i + 1).trim
      line = readLine(in)
    }
    b.result()
  }

  /** One CRLF-terminated line ("" for a blank line); null at EOF
    * before any byte. */
  private def readLine(in: InputStream): String = {
    var c = in.read()
    if (c == -1) return null
    if (c == '\n') return ""
    if (c == '\r') { in.read(); return "" } // consume LF
    val sb = new java.io.ByteArrayOutputStream()
    while (c != -1 && c != '\r' && c != '\n') { sb.write(c); c = in.read() }
    if (c == '\r') in.read() // consume LF
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }
}

/** Fixture-scale WARC writer (spec-conformant records; gzip variant
  * uses one gzip member per record as the spec prescribes, so readers
  * may seek between members). */
object WarcWriter {
  def write(path: String, records: Seq[(String, String, String, String)]): Unit = {
    val out = new java.io.FileOutputStream(path)
    val gz = path.endsWith(".gz")
    records.foreach { case (tpe, url, date, content) =>
      val payload = content.getBytes(StandardCharsets.UTF_8)
      val rec = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $tpe\r\n")
        .append(if (url.nonEmpty) s"WARC-Target-URI: $url\r\n" else "")
        .append(s"WARC-Date: $date\r\n")
        .append(s"Content-Length: ${payload.length}\r\n")
        .append("\r\n").toString.getBytes(StandardCharsets.UTF_8)
      val body = rec ++ payload ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
      if (gz) {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(body); g.close()
        out.write(bos.toByteArray)
      } else out.write(body)
    }
    out.close()
  }
}
