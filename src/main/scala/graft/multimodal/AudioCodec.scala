package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real WAV PCM sample decode — pure JVM (`ByteBuffer.asShortBuffer` is the
  * whole codec for PCM16). Complements [[MediaHeaders.wavMeta]] (header-only
  * fast path) with actual waveform access: sample arrays and one-pass
  * waveform statistics for audio-quality filtering in a training-data
  * pipeline (silence detection, clipping detection, level normalization).
  *
  * Supports PCM 16-bit (the dominant interchange format) and PCM 8-bit
  * (unsigned, rebased to signed per the WAV spec). Compressed codecs (MP3,
  * AAC, FLAC) have no JDK decoder; those bytes return None here and flow
  * through the pipeline as opaque binary with header metadata only.
  */
object AudioCodec {

  final case class Pcm(
      channels: Int, sampleRate: Int, bitsPerSample: Int, samples: Array[Int]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    def durationSec: Double =
      if (sampleRate == 0) 0.0 else nFrames.toDouble / sampleRate
  }

  /** Decode RIFF/WAVE PCM bytes to interleaved samples. None on malformed
    * bytes, non-PCM encodings, or unsupported bit depths — never throws,
    * never loops (chunk-length guards mirror [[MediaHeaders.wavMeta]]). */
  def decode(b: Array[Byte]): Option[Pcm] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    val le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // codec, channels, rate, bits
    var data: Option[(Int, Int)] = None          // offset, length
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, i, 4, "ASCII")
      val len = le.getInt(i + 4).toLong & 0xFFFFFFFFL
      if (len > b.length - i - 8) return None // malformed/truncated chunk
      if (id == "fmt " && len >= 16)
        fmt = Some((le.getShort(i + 8) & 0xFFFF, le.getShort(i + 10) & 0xFFFF,
          le.getInt(i + 12), le.getShort(i + 22) & 0xFFFF))
      else if (id == "data") data = Some((i + 8, len.toInt))
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    for {
      (codec, ch, rate, bits) <- fmt
      if codec == 1 && ch > 0 && rate > 0 // PCM only
      (off, dlen) <- data
      samples <- bits match {
        case 16 =>
          val n = dlen / 2
          val sb = ByteBuffer.wrap(b, off, n * 2)
            .order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
          val out = new Array[Int](n)
          var k = 0
          while (k < n) { out(k) = sb.get(k).toInt; k += 1 }
          Some(out)
        case 8 =>
          // WAV PCM8 is unsigned with 128 = silence; rebase to signed
          Some(Array.tabulate(dlen)(k => (b(off + k) & 0xFF) - 128))
        case _ => None
      }
    } yield Pcm(ch, rate, bits, samples)
  }

  final case class WaveStats(
      nSamples: Long, durationSec: Double, sumSamples: Long,
      peak: Int, rms: Double, clippedPct: Double)

  /** One-pass waveform statistics. `sumSamples` is an exact long (oracle-
    * friendly); `clippedPct` = fraction of samples at full scale (a real
    * audio-quality signal for pipeline filtering). */
  def stats(p: Pcm): WaveStats = {
    val full = (1 << (p.bitsPerSample - 1)) - 1
    var sum = 0L; var sq = 0.0; var peak = 0; var clipped = 0L
    var i = 0
    while (i < p.samples.length) {
      val s = p.samples(i)
      sum += s; sq += s.toDouble * s
      val a = math.abs(s)
      if (a > peak) peak = a
      if (a >= full) clipped += 1
      i += 1
    }
    val n = math.max(1, p.samples.length)
    WaveStats(p.samples.length.toLong, p.durationSec, sum, peak,
      math.sqrt(sq / n), clipped.toDouble / n)
  }

  /** Synthesize a PCM16 WAV from samples — fixture generator for specs and
    * the `m_audio_pcm_stats` oracle query (the inverse of [[decode]], so
    * round-trips are exact). */
  def pcm16Wav(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")); buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)
    buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes("ASCII")); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
