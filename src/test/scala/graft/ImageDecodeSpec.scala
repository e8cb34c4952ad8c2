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
}
