package graft.multimodal

/** Pure-JVM media *header* parsers — real metadata extraction for the
  * multimodal columns (pixel/sample decode stays stubbed: no codec libs in
  * this container, and training-data pipelines mostly need header facts —
  * dims, duration, format — for filtering/bucketing long before decode).
  *
  * Formats: JPEG (SOF0/1/2 frame header), PNG (IHDR), WAV (RIFF fmt/data).
  * All return None on malformed bytes; none allocate beyond a few ints.
  */
object MediaHeaders {

  final case class ImageDims(format: String, width: Int, height: Int)
  final case class AudioMeta(
      channels: Int, sampleRate: Int, bitsPerSample: Int, durationSec: Double)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)

  /** JPEG dimensions from the first SOF0/SOF1/SOF2 frame marker. */
  def jpegDims(b: Array[Byte]): Option[ImageDims] = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var i = 2
    while (i + 9 <= b.length) {
      if (u8(b, i) != 0xFF) return None
      val m = u8(b, i + 1)
      if (m == 0xD9 || m == 0xDA) return None
      val len = be16(b, i + 2)
      if (len < 2 || i + 2 + len > b.length) return None
      if (m == 0xC0 || m == 0xC1 || m == 0xC2) {
        // SOF: precision(1), height(2), width(2)
        return Some(ImageDims("jpeg", be16(b, i + 7), be16(b, i + 5)))
      }
      i += 2 + len
    }
    None
  }

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG dimensions from the IHDR chunk (always first). */
  def pngDims(b: Array[Byte]): Option[ImageDims] = {
    if (b == null || b.length < 24) return None
    if (!(0 until 8).forall(k => b(k) == PngSig(k))) return None
    // bytes 8-11 = IHDR length (13), 12-15 = "IHDR", 16-19 width, 20-23 height
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(ImageDims("png", w.toInt, h.toInt))
  }

  /** GIF logical-screen dimensions (header bytes 6-9, little-endian u16). */
  def gifDims(b: Array[Byte]): Option[ImageDims] = {
    if (b == null || b.length < 10) return None
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageDims("gif", w, h))
  }

  /** Any recognized image format. */
  def imageDims(b: Array[Byte]): Option[ImageDims] =
    jpegDims(b).orElse(pngDims(b)).orElse(gifDims(b))

  final case class VideoMeta(
      brand: String, durationSec: Double, width: Int, height: Int)

  /** MP4/ISO-BMFF video facts from a pure-JVM box walk: major brand from
    * `ftyp`, duration from `moov/mvhd` (timescale + duration), display
    * dims from the first `moov/trak/tkhd` with nonzero size (16.16 fixed
    * point). No codec involved — this is real container metadata, the
    * filter/bucket signal a pipeline needs long before (and usually
    * instead of) frame decode. None on malformed/truncated/non-MP4 bytes;
    * box-length guards prevent loops exactly as in [[wavMeta]]. */
  def mp4Meta(b: Array[Byte]): Option[VideoMeta] = {
    if (b == null || b.length < 16) return None
    // top-level: first box must be ftyp
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')) return None
    val ftypLen = be32(b, 0)
    if (ftypLen < 16 || ftypLen > b.length) return None
    val brand = new String(b, 8, 4, "ASCII").trim

    var mvhd: Option[Double] = None
    var dims: Option[(Int, Int)] = None

    // walk boxes in [from, until); descend into containers we care about
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var i = from
      while (i + 8 <= until && depth < 8) {
        val len = be32(b, i)
        if (len < 8 || i + len > until) return // malformed: stop cleanly
        val typ = new String(b, i + 4, 4, "ASCII")
        typ match {
          case "moov" | "trak" => walk(i + 8, (i + len).toInt, depth + 1)
          case "mvhd" if i + 8 + 20 <= until =>
            val ver = u8(b, i + 8)
            if (ver == 0) {
              val timescale = be32(b, i + 8 + 12)
              val duration = be32(b, i + 8 + 16)
              if (timescale > 0) mvhd = Some(duration.toDouble / timescale)
            } else if (ver == 1 && i + 8 + 32 <= until) {
              val timescale = be32(b, i + 8 + 20)
              val duration = (be32(b, i + 8 + 24) << 32) | be32(b, i + 8 + 28)
              if (timescale > 0) mvhd = Some(duration.toDouble / timescale)
            }
          case "tkhd" if i + 9 <= until =>
            val ver = u8(b, i + 8)
            val base = i + (if (ver == 1) 96 else 84) // abs offset of width field
            if (base + 8 <= until && dims.isEmpty) {
              val w = (be32(b, base) >> 16).toInt  // 16.16 fixed → integer part
              val h = (be32(b, base + 4) >> 16).toInt
              if (w > 0 && h > 0) dims = Some((w, h))
            }
          case _ => ()
        }
        i += len.toInt
      }
    }
    walk(ftypLen.toInt, b.length, 0)
    for (d <- mvhd) yield {
      val (w, h) = dims.getOrElse((0, 0))
      VideoMeta(brand, d, w, h)
    }
  }

  /** WAV audio facts from the RIFF fmt + data chunks. */
  def wavMeta(b: Array[Byte]): Option[AudioMeta] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var dataLen = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
      val id = new String(b, i, 4, "ASCII")
      val len = le32(b, i + 4)
      // malformed-length guard: a le32 length near 2^32 would wrap negative
      // on toInt and stall (or rewind) the cursor forever — reject lengths
      // that are negative or extend past the buffer instead of looping
      if (len < 0 || i + 8 + len > b.length) return None
      if (id == "fmt " && i + 8 + 16 <= b.length)
        fmt = Some((le16(b, i + 10), le32(b, i + 12).toInt, le16(b, i + 22)))
      else if (id == "data") dataLen = len
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    for ((ch, rate, bits) <- fmt if rate > 0 && ch > 0 && bits > 0 && dataLen >= 0)
      yield AudioMeta(ch, rate, bits,
        dataLen.toDouble / (rate.toLong * ch * (bits / 8)))
  }

  /** Compressed-audio facts from a frame-HEADER walk — no codec: every
    * MPEG audio (MP3) and ADTS (AAC) frame header states its own length
    * and sample count, so bitrate/sample-rate/duration fall out of a pure
    * byte walk. `frames` counted, `durationSec` summed per frame,
    * `bitrateKbps` = stream bytes over duration (so VBR streams report
    * their true average, not the first frame's nominal rate). */
  final case class FramedAudioMeta(
      format: String, sampleRate: Int, channels: Int, frames: Int,
      durationSec: Double, bitrateKbps: Double)

  // MPEG audio bitrate tables (kbps), index 1-14; 0 = "free" (stop), 15 = bad
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val MpegRates = Map( // version code → sample-rate table
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000)) // MPEG2.5

  /** ID3v2 tag length at offset 0 (syncsafe 28-bit size), or 0. */
  private def id3v2Len(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      10 + ((u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9))
    else 0

  /** MP3 (MPEG-1/2/2.5 Layer I/II/III) facts from walking frame headers.
    * Requires ≥ 2 valid consecutive frames so a random 0xFFE sync byte in
    * arbitrary binary is not misread as audio. Walks until the buffer
    * ends or a header stops parsing (truncated final frame is fine). */
  def mp3Meta(b: Array[Byte]): Option[FramedAudioMeta] = {
    if (b == null || b.length < 4) return None
    var i = id3v2Len(b)
    var frames = 0
    var dur = 0.0
    var bytes = 0L
    var rate = 0
    var chans = 0
    var ok = true
    while (ok && i + 4 <= b.length) {
      val h0 = u8(b, i); val h1 = u8(b, i + 1)
      if (h0 != 0xFF || (h1 & 0xE0) != 0xE0) ok = false
      else {
        val ver = (h1 >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        val layer = (h1 >> 1) & 3 // 3=Layer I, 2=Layer II, 1=Layer III
        val brIdx = (u8(b, i + 2) >> 4) & 0xF
        val srIdx = (u8(b, i + 2) >> 2) & 3
        val pad = (u8(b, i + 2) >> 1) & 1
        if (ver == 1 || layer == 0 || brIdx == 0 || brIdx == 15 || srIdx == 3) ok = false
        else {
          val v1 = ver == 3
          val table =
            if (layer == 3) { if (v1) BrV1L1 else BrV2L1 }
            else if (layer == 2) { if (v1) BrV1L2 else BrV2L23 }
            else { if (v1) BrV1L3 else BrV2L23 }
          val br = table(brIdx) * 1000
          val sr = MpegRates(ver)(srIdx)
          val (frameLen, samples) =
            if (layer == 3) ((12 * br / sr + pad) * 4, 384)
            else if (layer == 2) (144 * br / sr + pad, 1152)
            else if (v1) (144 * br / sr + pad, 1152) // Layer III MPEG1
            else (72 * br / sr + pad, 576) // Layer III MPEG2/2.5
          if (frameLen < 4) ok = false
          else {
            frames += 1
            dur += samples.toDouble / sr
            bytes += math.min(frameLen, b.length - i).toLong
            rate = sr
            chans = if (((u8(b, i + 3) >> 6) & 3) == 3) 1 else 2
            i += frameLen
          }
        }
      }
    }
    if (frames >= 2 && dur > 0)
      Some(FramedAudioMeta("mp3", rate, chans, frames, dur, bytes * 8 / dur / 1000.0))
    else None
  }

  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** AAC facts from walking ADTS frame headers (7/9 bytes; 13-bit frame
    * length, 1024 samples per AAC frame). Same ≥ 2-frame sync guard as
    * [[mp3Meta]]. */
  def aacAdtsMeta(b: Array[Byte]): Option[FramedAudioMeta] = {
    if (b == null || b.length < 7) return None
    var i = id3v2Len(b)
    var frames = 0
    var dur = 0.0
    var bytes = 0L
    var rate = 0
    var chans = 0
    var ok = true
    while (ok && i + 7 <= b.length) {
      if (u8(b, i) != 0xFF || (u8(b, i + 1) & 0xF6) != 0xF0) ok = false
      else {
        val srIdx = (u8(b, i + 2) >> 2) & 0xF
        val chanCfg = ((u8(b, i + 2) & 1) << 2) | ((u8(b, i + 3) >> 6) & 3)
        val frameLen = ((u8(b, i + 3) & 3) << 11) | (u8(b, i + 4) << 3) |
          ((u8(b, i + 5) >> 5) & 7)
        if (srIdx >= AdtsRates.length || frameLen < 7) ok = false
        else {
          val sr = AdtsRates(srIdx)
          frames += 1
          dur += 1024.0 / sr
          bytes += math.min(frameLen, b.length - i).toLong
          rate = sr
          chans = if (chanCfg == 0) 2 else math.min(chanCfg, 8)
          i += frameLen
        }
      }
    }
    if (frames >= 2 && dur > 0)
      Some(FramedAudioMeta("aac", rate, chans, frames, dur, bytes * 8 / dur / 1000.0))
    else None
  }

  /** FLAC facts from the mandatory STREAMINFO metadata block (always the
    * first block after the "fLaC" magic): sample rate (20 bits), channels
    * (3 bits, stored −1), bits/sample (5 bits, stored −1), total samples
    * (36 bits) ⇒ exact duration — no decode. Frame count reports total
    * samples / max block size (header-derived; FLAC frames are
    * variable-sized). Bitrate is stream bytes over duration. */
  def flacMeta(b: Array[Byte]): Option[FramedAudioMeta] = {
    if (b == null || b.length < 4 + 4 + 34) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    // first metadata block header: 1 byte (last-flag | type), 3 bytes len
    if ((u8(b, 4) & 0x7F) != 0) return None // STREAMINFO is type 0
    val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (len < 34 || 8 + len > b.length) return None
    val i = 8
    val maxBlock = be16(b, i + 2)
    val rate = (u8(b, i + 10) << 12) | (u8(b, i + 11) << 4) | (u8(b, i + 12) >> 4)
    val chans = ((u8(b, i + 12) >> 1) & 7) + 1
    val totalSamples = ((u8(b, i + 13) & 0x0F).toLong << 32) |
      (be32(b, i + 14) & 0xFFFFFFFFL)
    if (rate <= 0 || totalSamples <= 0) return None
    val dur = totalSamples.toDouble / rate
    val frames = math.max(1L, math.ceil(
      totalSamples.toDouble / math.max(1, maxBlock)).toLong).toInt
    Some(FramedAudioMeta("flac", rate, chans, frames, dur,
      b.length.toLong * 8 / dur / 1000.0))
  }

  /** Any recognized framed/compressed-audio format. */
  def framedAudioMeta(b: Array[Byte]): Option[FramedAudioMeta] =
    flacMeta(b).orElse(aacAdtsMeta(b)).orElse(mp3Meta(b))
}
