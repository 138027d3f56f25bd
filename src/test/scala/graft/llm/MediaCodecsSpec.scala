package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MediaCodecsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(rate: Float, seconds: Double): Array[Byte] = {
    val n = (rate * seconds).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 16384).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("PNG decode: real dimensions and a normalized histogram") {
    val info = MediaCodecs.imageFeatures(pngBytes(16, 8)).get
    assert(info.width == 16 && info.height == 8)
    assert(math.abs(info.histogram.sum - 1f) < 1e-5)
    // checkerboard: half the pixels in the darkest bin, half in the brightest
    assert(math.abs(info.histogram(0) - 0.5f) < 1e-5)
    assert(math.abs(info.histogram(7) - 0.5f) < 1e-5)
  }

  test("image resize: raster downscale, re-decodable, bounded dims") {
    val out = MediaCodecs.resizeImage(pngBytes(64, 32), maxDim = 16).get
    val img = ImageIO.read(new ByteArrayInputStream(out))
    assert(img.getWidth == 16 && img.getHeight == 8)
  }

  test("WAV decode: format metadata and sine RMS") {
    val info = MediaCodecs.wavFeatures(wavBytes(8000f, 0.5)).get
    assert(info.sampleRate == 8000f && info.channels == 1)
    assert(math.abs(info.durationSec - 0.5) < 1e-3)
    // RMS of a 0.5-amplitude sine ≈ 0.5/√2
    assert(math.abs(info.rms - 0.5 / math.sqrt(2)) < 0.01)
  }

  test("garbage bytes are rejected, not crashed on") {
    assert(MediaCodecs.imageFeatures("not an image".getBytes).isEmpty)
    assert(MediaCodecs.wavFeatures("not audio".getBytes).isEmpty)
  }

  test("mixed-modality Dataset: per-mime real decode through the batched path") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", pngBytes(16, 8)),
      Multimodal.MediaRecord(2L, "audio/wav", wavBytes(8000f, 0.25)),
      Multimodal.MediaRecord(3L, "text/plain", "hello world".getBytes("UTF-8"))
    ).toDS()
    val feats = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).feature.length == 8 &&
      math.abs(feats(1L).feature.sum - 1f) < 1e-5) // histogram
    assert(feats(2L).feature(0) == 8000f / 48000f) // sample-rate feature
    assert(feats(2L).feature(1) == 1f)             // mono
    assert(feats(3L).feature.length == 8)          // deterministic fallback
    // image resize through the composable stage
    val resized = Multimodal.resize(media.filter(_.mime == "image/png"), targetBytes = 8)
      .collect().head
    val img = ImageIO.read(new ByteArrayInputStream(resized.payload))
    assert(math.max(img.getWidth, img.getHeight) == 8)
  }
}
