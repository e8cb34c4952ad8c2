package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import graft.multimodal.BinaryMeta

/** REAL image decode/resize through the multimodal batch plumbing —
  * JDK ImageIO codecs, no external library, genuine pixels.
  */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17 + seed) & 0xffffff)))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  test("decodeImageMeta reads true dimensions and sniffs formats") {
    val df = Seq(
      (1L, png(32, 20, 1)), (2L, png(7, 7, 2)), (3L, bmp(12, 5)),
      (4L, "not an image".getBytes("UTF-8")))
      .toDF("id", "payload")
    val metas = BinaryMeta.decodeImageMeta(df, "id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(metas(1L).width == 32 && metas(1L).height == 20 && metas(1L).format == "png")
    assert(metas(2L).width == 7 && metas(2L).height == 7)
    assert(metas(3L).width == 12 && metas(3L).height == 5 && metas(3L).format == "bmp")
    // corrupt payloads degrade, never throw
    assert(metas(4L).width == -1 && metas(4L).format == "unknown")
  }

  test("decodeAudioMeta reads real WAV headers via javax.sound") {
    import javax.sound.sampled._
    def wav(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq((1L, wav(16000f, 1, 32000)), (2L, wav(44100f, 2, 4410)),
      (3L, "not audio".getBytes("UTF-8"))).toDF("id", "payload")
    val metas = BinaryMeta.decodeAudioMeta(df, "id", "payload")
      .collect().map(m => m.id -> m).toMap
    assert(metas(1L).sample_rate == 16000f && metas(1L).channels == 1 &&
      metas(1L).n_frames == 32000L && math.abs(metas(1L).duration_s - 2.0) < 1e-9)
    assert(metas(2L).sample_rate == 44100f && metas(2L).channels == 2 &&
      math.abs(metas(2L).duration_s - 0.1) < 1e-9)
    assert(metas(3L).channels == -1) // corrupt degrades, never throws
  }

  test("resizeImages produces decodable PNGs at the target size") {
    val df = Seq((1L, png(64, 48, 3)), (2L, "junk".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = BinaryMeta.resizeImages(df, "id", "payload", 16, 12).collect()
    assert(out.length == 1 && out.head.id == 1L) // junk row dropped
    val back = ImageIO.read(new java.io.ByteArrayInputStream(out.head.payload))
    assert(back.getWidth == 16 && back.getHeight == 12)
    assert(BinaryMeta.sniffFormat(out.head.payload) == "png")
  }

  // --- perceptual hash: the properties hash-equality gates can't ---

  private def stripePng(ax: Int, ay: Int, bright: Int = 230,
      dark: Int = 25): Array[Byte] = {
    val img = new BufferedImage(48, 48, BufferedImage.TYPE_INT_RGB)
    (0 until 48).foreach(x => (0 until 48).foreach { y =>
      val v = if (((x * ax + y * ay) / 6) % 2 == 0) bright else dark
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("phash64: deterministic; identical images collide; junk drops") {
    val h1 = BinaryMeta.phash64(stripePng(2, 3)).get
    val h2 = BinaryMeta.phash64(stripePng(2, 3)).get
    assert(h1 == h2)
    assert(BinaryMeta.phash64("junk".getBytes("UTF-8")).isEmpty)
  }

  private def texPng(fx: Double, fy: Double, amp: Int = 120): Array[Byte] = {
    val img = new BufferedImage(48, 48, BufferedImage.TYPE_INT_RGB)
    (0 until 48).foreach(x => (0 until 48).foreach { y =>
      val v0 = 128 + amp * math.sin(x * fx + 0.7) * math.cos(y * fy + 0.3)
      val v = math.max(0, math.min(255, v0.toInt))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("phash64: all 16 fixture stripe classes hash distinct") {
    // the exact-equality property dedup_phash's oracle gate stands on
    val classes = for (ax <- 1 to 4; ay <- 1 to 4)
      yield BinaryMeta.phash64(stripePng(ax, ay)).get
    assert(classes.distinct.length == 16)
  }

  test("phash64: perceptual on smooth textures — contrast invariant, frequencies far") {
    // photo-like spectra (where pHash operates in practice): a
    // contrast change rescales every AC coefficient uniformly, so
    // bits vs the median barely move; a different spatial frequency
    // rewrites the low-freq block wholesale. (Binary stripe fixtures
    // are deliberately NOT used here: their spectra tie half the
    // block at zero, where median thresholding is knife-edge — the
    // gate only needs their exact-equality/distinctness, above.)
    val base = BinaryMeta.phash64(texPng(0.5, 0.75)).get
    val dimmer = BinaryMeta.phash64(texPng(0.5, 0.75, amp = 70)).get
    assert(hamming(base, dimmer) <= 4,
      s"contrast change moved ${hamming(base, dimmer)} bits")
    val other = BinaryMeta.phash64(texPng(1.0, 0.25)).get
    assert(hamming(base, other) >= 16,
      s"different texture only ${hamming(base, other)} bits away")
    // near-dup vs distinct separation: the contrast variant sits
    // strictly closer than the different texture — the margin a
    // hamming-threshold dedup needs
    assert(hamming(base, dimmer) < hamming(base, other))
  }

  test("audioFps: deterministic tone separation; junk and non-16-bit drop") {
    import javax.sound.sampled._
    def toneWav(half: Int, frames: Int = 4000, amp: Int = 12000,
        bits: Int = 16): Array[Byte] = {
      val fmt = new AudioFormat(8000f, bits, 1, true, false)
      val bytesPer = bits / 8
      val pcm = new Array[Byte](frames * bytesPer)
      var i = 0
      while (i < frames) {
        val a = if ((i / half) % 2 == 0) amp else -amp
        pcm(bytesPer * i) = (a & 0xff).toByte
        if (bytesPer > 1) pcm(bytesPer * i + 1) = ((a >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, toneWav(5)), (2L, toneWav(5)),          // same tone → collide
      (3L, toneWav(9)), (4L, toneWav(9, amp = 900)), // other pitch / volume
      (5L, "junk".getBytes("UTF-8")),              // undecodable → drops
      (6L, toneWav(5, bits = 8)))                  // unsupported depth → drops
      .toDF("doc_id", "payload")
    val fps = BinaryMeta.audioFps(df, "doc_id", "payload")
      .collect().map(r => r.id -> r.afp).toMap
    assert(fps.keySet == Set(1L, 2L, 3L, 4L))
    assert(fps(1L) == fps(2L), "byte-identical tones must collide")
    assert(fps(1L) != fps(3L), "different pitch must separate")
    assert(fps(3L) != fps(4L), "different loudness must separate")
    // the 12 fixture classes the dedup_audiofp oracle stands on are
    // mutually distinct
    val classes = (0 until 12).map(c => {
      val b = toneWav(5 + c)
      BinaryMeta.audioFps(Seq((c.toLong, b)).toDF("doc_id", "payload"),
        "doc_id", "payload").collect().head.afp
    })
    assert(classes.distinct.length == 12)
  }
}
