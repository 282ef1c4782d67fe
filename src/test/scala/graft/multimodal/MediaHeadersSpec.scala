package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

class MediaHeadersSpec extends AnyFunSuite {

  private def jpegOf(width: Int, height: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(64)
    buf.put(0xFF.toByte); buf.put(0xD8.toByte)       // SOI
    buf.put(0xFF.toByte); buf.put(0xE0.toByte)       // APP0, skipped segment
    buf.putShort(6); buf.putInt(0)
    buf.put(0xFF.toByte); buf.put(0xC0.toByte)       // SOF0
    buf.putShort(11)
    buf.put(8.toByte)                                 // precision
    buf.putShort(height.toShort); buf.putShort(width.toShort)
    buf.put(3.toByte)                                 // components
    buf.array()
  }

  private def pngOf(width: Int, height: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(33)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    buf.putInt(13)
    buf.put("IHDR".getBytes)
    buf.putInt(width); buf.putInt(height)
    buf.array()
  }

  private def wavOf(channels: Int, rate: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * (bits / 8)
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1)                                  // PCM
    buf.putShort(channels.toShort)
    buf.putInt(rate)
    buf.putInt(rate * channels * bits / 8)           // byte rate
    buf.putShort((channels * bits / 8).toShort)      // block align
    buf.putShort(bits.toShort)
    buf.put("data".getBytes); buf.putInt(dataLen)
    buf.array()
  }

  test("jpeg dims from SOF0 after skipped segments") {
    assert(MediaHeaders.jpegDims(jpegOf(640, 480))
      === Some(MediaHeaders.ImageDims("jpeg", 640, 480)))
    assert(MediaHeaders.jpegDims("nope".getBytes).isEmpty)
    assert(MediaHeaders.jpegDims(jpegOf(640, 480).take(6)).isEmpty)
  }

  test("png dims from IHDR") {
    assert(MediaHeaders.pngDims(pngOf(1920, 1080))
      === Some(MediaHeaders.ImageDims("png", 1920, 1080)))
    assert(MediaHeaders.pngDims(jpegOf(10, 10)).isEmpty)
  }

  test("wav meta: channels, rate, bits, duration") {
    val m = MediaHeaders.wavMeta(wavOf(2, 44100, 16, 44100)).get
    assert(m.channels === 2 && m.sampleRate === 44100 && m.bitsPerSample === 16)
    assert(math.abs(m.durationSec - 1.0) < 1e-9)
    assert(MediaHeaders.wavMeta("RIFFjunk".getBytes).isEmpty)
  }

  test("wav meta: malformed chunk lengths return None instead of looping") {
    // le32 chunk length 0xFFFFFFF8 wraps negative on toInt — the cursor
    // would never advance without the malformed-length guard
    val buf = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(56); buf.put("WAVE".getBytes)
    buf.put("junk".getBytes); buf.putInt(0xFFFFFFF8)
    assert(MediaHeaders.wavMeta(buf.array()).isEmpty)
    // chunk claiming to extend past the buffer is also malformed
    val buf2 = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    buf2.put("RIFF".getBytes); buf2.putInt(56); buf2.put("WAVE".getBytes)
    buf2.put("fmt ".getBytes); buf2.putInt(100000)
    assert(MediaHeaders.wavMeta(buf2.array()).isEmpty)
  }

  test("decode() uses real header facts for recognized formats") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      ("a.jpg", jpegOf(320, 200)),
      ("b.png", pngOf(64, 32)),
      ("c.wav", wavOf(1, 8000, 16, 16000)),
      ("d.bin", "opaque-bytes".getBytes)
    ).toDF("path", "content")
    val metas = Multimodal.decode(df, "image").collect()
      .map(r => r.getString(0) -> r.getStruct(3)).toMap
    assert(metas("a.jpg").getString(0) === "jpeg")
    assert(metas("a.jpg").getInt(1) === 320 && metas("a.jpg").getInt(2) === 200)
    assert(metas("b.png").getString(0) === "png")
    assert(metas("b.png").getInt(1) === 64)
    assert(metas("c.wav").getString(0) === "wav")
    assert(metas("c.wav").getInt(1) === 1 && metas("c.wav").getInt(2) === 8000)
    assert(metas("c.wav").getInt(3) === 2) // 16000 samples / 8000 Hz
    assert(metas("d.bin").getString(0) === "bin") // stub fallback
  }
}
