package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Real decode specs: javax.imageio pixels and PCM waveforms. PNG/PCM are
  * lossless, so assertions are exact; JPEG is lossy, so its assertions are
  * dims-exact + stats-with-tolerance. */
class RealCodecSpec extends AnyFunSuite {

  test("PNG encode→decode round-trips pixel statistics bit-exactly") {
    val img = ImageCodec.testPattern(64, 48, seed = 1)
    val bytes = ImageCodec.encode(img, "png")
    val d = ImageCodec.decode(bytes).get
    assert(d.format === "png" && d.width === 64 && d.height === 48)
    assert(d.channels === 3)
    val (r, g, b, n) = ImageCodec.channelSums(d.img)
    val (er, eg, eb) = ImageCodec.expectedPatternSums(64, 48, 1)
    assert(n === 64L * 48)
    assert((r, g, b) === ((er, eg, eb)))
  }

  test("JPEG decode: exact dims, means within lossy tolerance") {
    val img = ImageCodec.testPattern(96, 64, seed = 2)
    val bytes = ImageCodec.encode(img, "jpg")
    val d = ImageCodec.decode(bytes).get
    assert(d.format === "jpeg" && d.width === 96 && d.height === 64)
    val (r, g, b) = ImageCodec.meanRgb(d.img)
    val (er, eg, eb) = ImageCodec.expectedPatternSums(96, 64, 2)
    val np = 96.0 * 64
    // DCT quantization shifts individual pixels but barely moves the mean
    assert(math.abs(r - er / np) < 3.0)
    assert(math.abs(g - eg / np) < 3.0)
    assert(math.abs(b - eb / np) < 3.0)
  }

  test("decode returns None on non-image bytes, never throws") {
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
    // truncated PNG: header survives sniffing but the decoder must fail
    val png = ImageCodec.encode(ImageCodec.testPattern(32, 32, 0), "png")
    assert(ImageCodec.decode(png.take(30)).isEmpty)
  }

  test("box resize of a constant image is exact; of a gradient is the box mean") {
    val const = new java.awt.image.BufferedImage(40, 40, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 40; x <- 0 until 40) const.setRGB(x, y, 0x305070)
    val cs = ImageCodec.boxResize(const, 5, 5)
    for (y <- 0 until 5; x <- 0 until 5)
      assert((cs.getRGB(x, y) & 0xFFFFFF) === 0x305070)

    // horizontal ramp r = x: a 4-wide box [4k, 4k+3] has integer mean 4k+1
    val ramp = new java.awt.image.BufferedImage(32, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 32) ramp.setRGB(x, y, x << 16)
    val rs = ImageCodec.boxResize(ramp, 8, 8)
    for (x <- 0 until 8)
      assert(((rs.getRGB(x, 0) >> 16) & 0xFF) === 4 * x + 1)
  }

  test("perceptual hashes survive lossy re-encode; differ across content") {
    val a = ImageCodec.testPattern(128, 96, seed = 3)
    val aJpeg = ImageCodec.decode(ImageCodec.encode(a, "jpg")).get.img
    // same content, different encoding → tiny Hamming distance
    assert(ImageCodec.hamming(ImageCodec.aHash(a), ImageCodec.aHash(aJpeg)) <= 5)
    assert(ImageCodec.hamming(ImageCodec.dHash(a), ImageCodec.dHash(aJpeg)) <= 5)
    // different content → large distance
    val b = ImageCodec.testPattern(128, 96, seed = 9)
    assert(ImageCodec.hamming(ImageCodec.dHash(a), ImageCodec.dHash(b)) > 10)
  }

  test("PCM16 WAV decode: exact samples, stats, duration") {
    val samples = Array.tabulate(8000)(i => ((i * 37) % 4001 - 2000).toShort)
    val bytes = AudioCodec.pcm16Wav(1, 8000, samples)
    val p = AudioCodec.decode(bytes).get
    assert(p.channels === 1 && p.sampleRate === 8000 && p.bitsPerSample === 16)
    assert(p.samples.toSeq === samples.map(_.toInt).toSeq)
    assert(p.durationSec === 1.0)
    val s = AudioCodec.stats(p)
    assert(s.nSamples === 8000L)
    assert(s.sumSamples === samples.map(_.toLong).sum)
    assert(s.peak === samples.map(v => math.abs(v.toInt)).max)
    assert(s.clippedPct === 0.0)
    val expectedRms = math.sqrt(samples.map(v => v.toDouble * v).sum / 8000)
    assert(math.abs(s.rms - expectedRms) < 1e-9)
  }

  test("PCM8 decode rebases unsigned to signed; clipping is detected") {
    // PCM8: build a minimal wav by patching pcm16Wav output is messy — craft directly
    val n = 100
    val data = Array.tabulate(n)(i => (if (i < 10) 255 else 128).toByte) // 10 clipped highs
    val buf = java.nio.ByteBuffer.allocate(44 + n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + n); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1); buf.putInt(1000); buf.putInt(1000)
    buf.putShort(1); buf.putShort(8)
    buf.put("data".getBytes); buf.putInt(n); buf.put(data)
    val p = AudioCodec.decode(buf.array()).get
    assert(p.bitsPerSample === 8)
    assert(p.samples.take(10).forall(_ === 127))
    assert(p.samples.drop(10).forall(_ === 0))
    val s = AudioCodec.stats(p)
    assert(s.clippedPct === 0.1)
  }

  test("audio decode rejects non-PCM, malformed, and truncated bytes") {
    assert(AudioCodec.decode("RIFFjunk".getBytes).isEmpty)
    assert(AudioCodec.decode(null).isEmpty)
    val ok = AudioCodec.pcm16Wav(1, 8000, Array.tabulate(100)(_.toShort))
    assert(AudioCodec.decode(ok.take(50)).isEmpty) // truncated data chunk
    val nonPcm = ok.clone(); nonPcm(20) = 3 // format code → IEEE float
    assert(AudioCodec.decode(nonPcm).isEmpty)
  }
}
