package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Real media decoders over the codecs the JVM itself ships —
  * `javax.imageio` (PNG/JPEG/BMP/GIF) and `javax.sound.sampled`
  * (WAV/PCM). No external libraries: these run on any executor with a
  * stock JRE, headless included.
  *
  * Everything here is pure `Array[Byte] → value` so it slots into the
  * batched `mapPartitions` shape in [[Multimodal]]; codecs that the JDK
  * does NOT ship (video, modern audio) remain behind the deterministic
  * fallback, clearly marked there.
  */
object MediaCodecs {

  final case class ImageInfo(width: Int, height: Int, histogram: Array[Float])

  /** Decode an image payload and produce dimensions plus an 8-bin
    * normalized grayscale histogram — the classic cheap visual feature.
    * None when the bytes aren't a decodable image.
    */
  def imageFeatures(payload: Array[Byte]): Option[ImageInfo] =
    decodeImage(payload).map { img =>
      val bins = new Array[Float](8)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          bins(lum >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val total = (w * h).toFloat
      ImageInfo(w, h, bins.map(_ / total))
    }

  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Real raster resize (area-averaging scale, PNG re-encode). */
  def resizeImage(payload: Array[Byte], maxDim: Int): Option[Array[Byte]] =
    decodeImage(payload).map { img =>
      val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
      val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt))
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING),
        0, 0, null)
      g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  final case class AudioInfo(sampleRate: Float, channels: Int, nFrames: Long,
                             durationSec: Double, rms: Double)

  /** Decode a WAV payload: format metadata + RMS energy over the PCM
    * samples (16-bit little-endian path; other widths fall back to
    * byte-level RMS). None when the bytes aren't a parseable WAV.
    */
  def wavFeatures(payload: Array[Byte]): Option[AudioInfo] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      val frames = in.getFrameLength
      val data = in.readAllBytes()
      val rms =
        if (fmt.getSampleSizeInBits == 16) {
          var sum = 0.0; var i = 0
          while (i + 1 < data.length) {
            val s = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort / 32768.0
            sum += s * s; i += 2
          }
          math.sqrt(sum / math.max(1, data.length / 2))
        } else {
          var sum = 0.0; var i = 0
          while (i < data.length) { val v = data(i) / 128.0; sum += v * v; i += 1 }
          math.sqrt(sum / math.max(1, data.length))
        }
      Some(AudioInfo(fmt.getSampleRate, fmt.getChannels, frames,
        frames / fmt.getSampleRate.toDouble, rms))
    } catch { case _: Exception => None }
}
