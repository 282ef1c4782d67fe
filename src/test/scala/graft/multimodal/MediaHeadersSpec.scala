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

  // MPEG1 Layer III, 44100 Hz, 128 kbps, stereo, no padding:
  // frame length = 144 * 128000 / 44100 = 417 bytes, 1152 samples/frame
  private def mp3Of(nFrames: Int): Array[Byte] = {
    val frame = new Array[Byte](417)
    frame(0) = 0xFF.toByte
    frame(1) = 0xFB.toByte // sync | MPEG1 (3<<3) | Layer III (1<<1) | no CRC
    frame(2) = 0x90.toByte // bitrate idx 9 (=128k) << 4 | rate idx 0 (=44100) << 2
    frame(3) = 0x00.toByte // stereo
    Array.fill(nFrames)(frame).flatten
  }

  // ADTS AAC-LC, 44100 Hz (idx 4), 2 channels, frameLen bytes/frame
  private def aacOf(nFrames: Int, frameLen: Int): Array[Byte] = {
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xFF.toByte
    frame(1) = 0xF1.toByte // sync | MPEG-4 | no CRC
    frame(2) = 0x50.toByte // AAC-LC (1<<6) | rate idx 4 << 2 | chanCfg hi bit 0
    frame(3) = (0x80 | ((frameLen >> 11) & 3)).toByte // chanCfg 2 << 6 | len hi
    frame(4) = ((frameLen >> 3) & 0xFF).toByte
    frame(5) = ((frameLen & 7) << 5).toByte
    frame(6) = 0xFC.toByte
    Array.fill(nFrames)(frame).flatten
  }

  test("mp3 frame-header walk: rate, channels, frames, duration, avg bitrate") {
    val m = MediaHeaders.mp3Meta(mp3Of(10)).get
    assert(m.format === "mp3" && m.sampleRate === 44100 && m.channels === 2)
    assert(m.frames === 10)
    assert(math.abs(m.durationSec - 10 * 1152.0 / 44100) < 1e-9)
    // 417-byte frames are the floor of the exact 417.96 at 128 kbps, so the
    // measured average sits just under nominal
    assert(m.bitrateKbps > 120 && m.bitrateKbps < 129)
    // an ID3v2 tag in front is skipped (syncsafe size = 100 → 110 total)
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100) ++ mp3Of(3)
    assert(MediaHeaders.mp3Meta(id3).get.frames === 3)
    // one lone sync word in arbitrary bytes is NOT audio (≥2-frame guard)
    assert(MediaHeaders.mp3Meta(mp3Of(1)).isEmpty)
    assert(MediaHeaders.mp3Meta("random bytes".getBytes).isEmpty)
  }

  test("aac ADTS frame-header walk: rate, channels, frames, duration") {
    val m = MediaHeaders.aacAdtsMeta(aacOf(5, 100)).get
    assert(m.format === "aac" && m.sampleRate === 44100 && m.channels === 2)
    assert(m.frames === 5)
    assert(math.abs(m.durationSec - 5 * 1024.0 / 44100) < 1e-9)
    assert(MediaHeaders.aacAdtsMeta(aacOf(1, 100)).isEmpty)
    assert(MediaHeaders.aacAdtsMeta(wavOf(2, 44100, 16, 100)).isEmpty)
    // dispatcher picks the right parser for each stream
    assert(MediaHeaders.framedAudioMeta(aacOf(3, 64)).get.format === "aac")
    assert(MediaHeaders.framedAudioMeta(mp3Of(3)).get.format === "mp3")
  }

  // FLAC: "fLaC" magic + STREAMINFO (type 0, 34 bytes): min/max block,
  // min/max frame, then 20-bit rate | 3-bit chans-1 | 5-bit bps-1 |
  // 36-bit total samples packed big-endian from byte 10 of the block
  private def flacOf(rate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + 34)
    buf.put("fLaC".getBytes)
    buf.put(0x00.toByte) // STREAMINFO, not last (flag irrelevant here)
    buf.put(0x00.toByte); buf.put(0x00.toByte); buf.put(34.toByte)
    buf.putShort(4096.toShort); buf.putShort(4096.toShort) // min/max block
    buf.put(new Array[Byte](6)) // min/max frame size (24 bits each)
    buf.put((rate >> 12).toByte)
    buf.put(((rate >> 4) & 0xFF).toByte)
    buf.put((((rate & 0xF) << 4) | ((channels - 1) << 1) | 0).toByte) // bps hi=0
    buf.put((((16 - 1) & 0x1F) << 4 | ((totalSamples >> 32) & 0xF)).toInt.toByte)
    buf.putInt((totalSamples & 0xFFFFFFFFL).toInt)
    buf.put(new Array[Byte](16)) // md5
    buf.array()
  }

  test("flac STREAMINFO: rate, channels, exact duration from total samples") {
    val m = MediaHeaders.flacMeta(flacOf(44100, 2, 441000L)).get
    assert(m.format === "flac" && m.sampleRate === 44100 && m.channels === 2)
    assert(math.abs(m.durationSec - 10.0) < 1e-9)
    assert(m.frames === math.ceil(441000.0 / 4096).toInt)
    assert(MediaHeaders.flacMeta("fLaX nope".getBytes).isEmpty)
    assert(MediaHeaders.flacMeta(flacOf(44100, 2, 441000L).take(20)).isEmpty)
    assert(MediaHeaders.framedAudioMeta(flacOf(8000, 1, 8000L)).get.format === "flac")
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
