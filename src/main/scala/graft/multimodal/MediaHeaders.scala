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
}
