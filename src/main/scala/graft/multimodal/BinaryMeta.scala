package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata
  * (SURVEY.md §2 "LLM-data-pipeline: multimodal").
  *
  * The IMAGE path is REAL: `decodeImageMeta`/`resizeImages` use the
  * JDK's built-in ImageIO codecs (PNG/JPEG/BMP/GIF) — actual pixel
  * decode and bilinear resize, no external library. Audio/video
  * remain STUBBED behind `fakeDecode` (the JDK has no codecs for
  * them), a deterministic function of the bytes, so their Spark-side
  * plumbing (schema, encoders, batch iteration, partitioning) is
  * real and tested while the codec is swappable.
  *
  * Scale: `decodeMeta` is a `mapPartitions` over the typed Dataset —
  * the batch-iterator shape a real decoder needs (amortized codec
  * init per partition, streaming iteration, no per-row JNI setup), and
  * the binary column never shuffles: decode happens at scan site and
  * only the small metadata struct flows on.
  */
object BinaryMeta {

  /** Typed metadata a decoder would produce. */
  final case class MediaMeta(id: Long, n_bytes: Int, width: Int,
      height: Int, format: String)

  // not private: Spark's encoder codegen needs public accessors
  final case class BinRow(id: Long, payload: Array[Byte])

  /** STUB decoder — deterministic fake: dimensions/format derived from
    * payload size and first byte. Replace with a real codec call; the
    * signature (bytes in, meta out) is the real contract. */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    // all fields derive from the byte LENGTH only: a first-byte rule
    // would diverge from any SQL oracle using ascii() (codepoint, not
    // UTF-8 byte) on non-ASCII payloads
    MediaMeta(id, n, n % 640, (n * 7) % 480,
      (n % 3) match { case 0 => "png"; case 1 => "jpg"; case _ => "webp" })
  }

  /** Attach a fake binary payload column (UTF-8 bytes of a text
    * column) — stands in for a real image/audio column. */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Batch decode: binary column → typed metadata Dataset via
    * mapPartitions (per-partition codec lifecycle). */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions { rows =>
        // real decoder would init its codec context here, once
        rows.map(r => fakeDecode(r.id, r.payload))
      }
  }

  /** REAL image decode via the JDK's ImageIO — PNG/JPEG/BMP/GIF
    * codecs ship WITH the JVM, so this path needs no external
    * library: same mapPartitions batch contract as the stub decoder
    * (which remains for audio/video, where the JDK has no codec).
    * Unreadable payloads yield width/height −1 and format "unknown"
    * instead of failing the task — at 100 TB a corrupt blob must
    * never kill a 10k-partition job. */
  def decodeImageMeta(df: DataFrame, idCol: String,
      payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions { rows =>
        // the default ImageIO stream cache spools through a temp FILE
        // per decode; in-memory is strictly better for byte-array
        // payloads (static JVM-wide flag, idempotent per task)
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case _: Exception => null }
          if (img == null) MediaMeta(r.id, r.payload.length, -1, -1, "unknown")
          else MediaMeta(r.id, r.payload.length, img.getWidth, img.getHeight,
            sniffFormat(r.payload))
        }
      }
  }

  /** Container format from magic bytes (cheap, no decode). */
  def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else "unknown"

  final case class AudioMeta(id: Long, n_bytes: Int, sample_rate: Float,
      channels: Int, bits: Int, n_frames: Long, duration_s: Double)

  /** The JDK's audio file readers, resolved ONCE per task via the
    * public SPI. `AudioSystem.getAudioInputStream` re-runs the
    * provider registry scan under a class-level lock on EVERY call,
    * which serializes a 32-task decode loop; iterating the same
    * providers directly is the identical codec path minus the global
    * lock (readers signal "not mine" with
    * UnsupportedAudioFileException, exactly as AudioSystem iterates
    * them). */
  def audioReaders(): Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }

  private def openAudio(readers: Seq[javax.sound.sampled.spi.AudioFileReader],
      payload: Array[Byte]): javax.sound.sampled.AudioInputStream =
    openAudioFrom(readers, 0, payload)._1

  /** Probe readers starting at `first` (then the rest in order) and
    * return (stream, winning index). A corpus is usually ONE container
    * format, and every losing probe constructs an
    * UnsupportedAudioFileException — starting from the caller's
    * last-successful reader makes the steady state exception-free. */
  private def openAudioFrom(
      readers: Seq[javax.sound.sampled.spi.AudioFileReader], first: Int,
      payload: Array[Byte]): (javax.sound.sampled.AudioInputStream, Int) = {
    val n = readers.length
    var k = 0
    while (k < n) {
      val i = if (k == 0) math.min(first, n - 1)
        else if (k <= math.min(first, n - 1)) k - 1 // the ones we skipped
        else k
      try return (readers(i).getAudioInputStream(
        new java.io.ByteArrayInputStream(payload)), i)
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
      k += 1
    }
    // registry empty or nobody claimed it — AudioSystem is the
    // authoritative fallback (and throws the same way on junk)
    (javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload)), 0)
  }

  /** REAL audio (WAV/AIFF/AU) metadata decode via the JDK's
    * javax.sound.sampled — like the image path, no external codec
    * needed for the JVM-native container formats. Unreadable payloads
    * degrade to sentinel values, never fail the task. */
  def decodeAudioMeta(df: DataFrame, idCol: String,
      payloadCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions { rows =>
        val readers = audioReaders()
        var pref = 0 // last-successful reader — steady state probes it first
        rows.map { r =>
          try {
            val (in, idx) = openAudioFrom(readers, pref, r.payload)
            pref = idx
            val f = in.getFormat
            val frames = in.getFrameLength
            val dur = if (f.getFrameRate > 0) frames / f.getFrameRate.toDouble else -1.0
            in.close()
            AudioMeta(r.id, r.payload.length, f.getSampleRate, f.getChannels,
              f.getSampleSizeInBits, frames, dur)
          } catch {
            case _: Exception =>
              AudioMeta(r.id, r.payload.length, -1f, -1, -1, -1L, -1.0)
          }
        }
      }
  }

  final case class ImageBytes(id: Long, width: Int, height: Int, payload: Array[Byte])

  /** REAL image resize: decode (ImageIO), scale (AWT, bilinear),
    * re-encode as PNG — actual pixels out, not a size estimate. The
    * flat (id, w, h, bytes) row is what a downstream vision-encoder
    * batch consumes. Unreadable inputs are dropped (flatMap), with
    * the same corrupt-blob tolerance as decodeImageMeta. */
  def resizeImages(df: DataFrame, idCol: String, payloadCol: String,
      targetW: Int, targetH: Int): Dataset[ImageBytes] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file spooling
        rows.flatMap { r =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            val out = new java.awt.image.BufferedImage(targetW, targetH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(ImageBytes(r.id, targetW, targetH, bos.toByteArray))
          }
        }
      }
  }

  final case class MediaFeature(id: Long, embedding: Array[Float])
  final case class ResizedMeta(id: Long, width: Int, height: Int, n_bytes: Int)
  final case class FrameSample(id: Long, frame_idx: Int, offset: Long)

  /** STUB feature extractor — a deterministic hash-derived embedding
    * standing in for a vision/audio encoder. The Spark contract is the
    * real part: batch iteration, fixed-width float vector output ready
    * for the ann/ operators downstream. */
  def featureExtract(df: DataFrame, idCol: String, payloadCol: String,
      dims: Int = 16): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val vec = Array.tabulate(dims) { i =>
            var h = 1469598103934665603L ^ (i * 0x9E3779B97F4A7C15L)
            r.payload.foreach { b => h ^= b; h *= 1099511628211L }
            ((h >>> 11).toFloat / (1L << 53).toFloat) * 2f - 1f
          }
          MediaFeature(r.id, vec)
        }
      }
  }

  /** STUB resize — target dimensions pass through, "resized" byte
    * count scales deterministically with the area ratio. */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      targetW: Int, targetH: Int): Dataset[ResizedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions(_.map { r =>
        val m = fakeDecode(r.id, r.payload)
        val ratio = (targetW.toLong * targetH).toDouble /
          math.max(m.width.toLong * m.height, 1L)
        ResizedMeta(r.id, targetW, targetH,
          math.max((m.n_bytes * ratio).toInt, 1))
      })
  }

  /** STUB frame sampler — one output row per sampled frame with a
    * deterministic byte offset; flatMap shape (1 row in, N out) is the
    * real contract for video frame extraction. */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      nFrames: Int): Dataset[FrameSample] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .flatMap { r =>
        val n = r.payload.length
        (0 until math.min(nFrames, math.max(n, 1))).map { i =>
          FrameSample(r.id, i, (n.toLong * i) / math.max(nFrames, 1))
        }
      }
  }

  final case class PHashRow(id: Long, phash: Long)

  // DCT-II basis for the 32×32 pHash grid, built once per JVM
  private lazy val dctCos: Array[Array[Double]] = Array.tabulate(32, 32) {
    (u, x) => math.cos((2 * x + 1) * u * math.Pi / 64.0)
  }

  /** 64-bit perceptual hash (the classic pHash recipe): REAL decode,
    * 32×32 bilinear grayscale reduction, 2-D DCT-II, then one bit per
    * low-frequency coefficient (the top-left 8×8 block, DC excluded;
    * threshold = median of those 63 + DC's replacement, computed over
    * the 64-entry block with DC zeroed) — visually-identical images
    * collide, small perturbations stay within a few Hamming bits,
    * different images land far apart. Deterministic: fixed AWT
    * bilinear path, double arithmetic, no RNG. Returns None on
    * undecodable payloads (same tolerance as decodeImageMeta). */
  def phash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val small = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 32, 32, null)
    g.dispose()
    val gray = Array.ofDim[Double](32, 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val rgb = small.getRGB(x, y)
        gray(y)(x) = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    // top-left 8×8 of the 2-D DCT (row pass then column pass over
    // only the 8 needed frequencies — 32×8 work, not 32×32)
    val rowDct = Array.ofDim[Double](32, 8)
    y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += gray(y)(x) * dctCos(u)(x); x += 1 }
        rowDct(y)(u) = s
        u += 1
      }
      y += 1
    }
    val block = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += rowDct(yy)(u) * dctCos(v)(yy); yy += 1 }
        block(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    block(0) = 0.0 // drop DC: overall brightness must not dominate
    val sorted = block.clone().sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var h = 0L
    var i = 0
    while (i < 64) { if (block(i) > median) h |= 1L << i; i += 1 }
    Some(h)
  }

  /** pHash frame: one 64-bit hash per decodable payload (flatMap —
    * corrupt blobs drop, as everywhere in this family). */
  def phashes(df: DataFrame, idCol: String, payloadCol: String): Dataset[PHashRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap(r => phash64(r.payload).map(PHashRow(r.id, _)))
      }
  }

  final case class AudioFpRow(id: Long, afp: Long)

  /** 64-bit acoustic fingerprint from a REAL PCM decode: the audio
    * sibling of phash64. The decoded stream splits into 16 equal
    * windows; each contributes its zero-crossing count (pitch — the
    * classic ZCR feature) and its window-mean |amplitude| quantized
    * to 8 bits (loudness envelope), FNV-1a-64 over the 32-int
    * profile. Byte-identical audio collides; different tones/volume
    * envelopes land apart. None for undecodable or non-16-bit
    * payloads (same tolerance as decodeAudioMeta). 16-bit signed PCM
    * both endiannesses; multi-channel profiles use channel 0. */
  def audioFp64(in: javax.sound.sampled.AudioInputStream): Option[Long] = {
    val f = in.getFormat
    if (f.getSampleSizeInBits != 16) { in.close(); return None }
    val data = in.readAllBytes(); in.close()
    val frameSize = f.getFrameSize
    val be = f.isBigEndian
    val n = if (frameSize > 0) data.length / frameSize else 0
    if (n < 32) return None
    val wins = 16
    val zc = new Array[Int](wins)
    val en = new Array[Long](wins)
    var i = 0
    var prevSign = 0
    while (i < n) {
      val off = i * frameSize
      val b0 = data(off) & 0xff
      val b1 = data(off + 1) & 0xff
      val s = (if (be) (b0 << 8) | b1 else (b1 << 8) | b0).toShort.toInt
      val w = (i.toLong * wins / n).toInt
      en(w) += math.abs(s)
      val sign = if (s > 0) 1 else if (s < 0) -1 else 0
      if (sign != 0 && prevSign != 0 && sign != prevSign) zc(w) += 1
      if (sign != 0) prevSign = sign
      i += 1
    }
    var h = 0xcbf29ce484222325L
    def mixInt(v: Int): Unit = {
      var k = 0
      while (k < 4) { h ^= (v >>> (k * 8)) & 0xff; h *= 0x100000001b3L; k += 1 }
    }
    var w = 0
    while (w < wins) {
      mixInt(zc(w))
      mixInt(((en(w) * wins) / n / 256L).toInt) // mean |amp| → 8-bit level
      w += 1
    }
    Some(h)
  }

  /** Acoustic-fingerprint frame (flatMap; corrupt blobs drop). Same
    * last-successful-reader preference as decodeAudioMeta — the
    * steady state over a one-format corpus probes exception-free. */
  def audioFps(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioFpRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .as[BinRow]
      .mapPartitions { rows =>
        val readers = audioReaders()
        var pref = 0
        rows.flatMap { r =>
          try {
            val (in, idx) = openAudioFrom(readers, pref, r.payload)
            pref = idx
            audioFp64(in).map(AudioFpRow(r.id, _))
          } catch { case _: Exception => None }
        }
      }
  }
}
