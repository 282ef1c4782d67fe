package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real pixel codec over `javax.imageio` (ships in OpenJDK's `java.desktop`
  * module; JPEG/PNG/BMP/GIF/TIFF readers all work headless — verified by
  * round-trip in this container). This replaces the round-2 StubCodec for
  * every image-shaped operator: decode, per-channel statistics, histograms,
  * deterministic box resize, and perceptual hashes (aHash/dHash) for
  * image-level near-duplicate detection.
  *
  * Everything here is executor-side, row-local, and allocation-conscious:
  * decode cost dominates, stats are one pass over `getRGB` words. At 100 TB
  * these run inside the `mapPartitions` batch seam in [[Multimodal]] — one
  * ImageIO call per row, no driver involvement, no shuffle.
  *
  * Determinism notes (why specs/oracles can be exact):
  *  - PNG is lossless: encode→decode round-trips pixels bit-exactly, so any
  *    statistic of a synthetic pattern is analytically computable.
  *  - Box resize uses integer pixel-count denominators (no float resampling
  *    kernels), so downsampled means are exact rationals.
  *  - JPEG is lossy; JPEG assertions belong in specs with tolerances, never
  *    in exact oracles.
  */
object ImageCodec {

  final case class Decoded(
      format: String, width: Int, height: Int, channels: Int, img: BufferedImage)

  /** Decode any ImageIO-supported format. None on undecodable bytes (ImageIO
    * returns null rather than throwing for unknown containers; truncated
    * streams throw — both map to None). Format is sniffed from the real
    * header, not the decoded raster. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else Some(Decoded(sniffFormat(bytes), img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents, img))
    } catch { case _: Exception => None }
  }

  /** Container sniff from magic bytes (cheaper and more honest than trusting
    * the decoder's internal name). */
  def sniffFormat(b: Array[Byte]): String = {
    def u(i: Int) = b(i) & 0xFF
    if (b.length >= 2 && u(0) == 0xFF && u(1) == 0xD8) "jpeg"
    else if (b.length >= 8 && u(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 4 && ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))) "tiff"
    else "bin"
  }

  /** ITU-R BT.601 integer luma of a packed RGB pixel: (77R+150G+29B)>>8 —
    * the ONE luma definition shared by the histogram embedding and both
    * perceptual hashes (a drift between them would silently decorrelate
    * features from hashes). */
  @inline def luma(p: Int): Int =
    (77 * ((p >> 16) & 0xFF) + 150 * ((p >> 8) & 0xFF) + 29 * (p & 0xFF)) >> 8

  /** One-pass per-channel pixel sums (exact longs — oracle-friendly: no
    * rounding ambiguity, unlike means) plus pixel count. */
  def channelSums(img: BufferedImage): (Long, Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
        x += 1
      }
      y += 1
    }
    (r, g, b, img.getWidth.toLong * img.getHeight)
  }

  /** Mean RGB as doubles (derived from the exact sums). */
  def meanRgb(img: BufferedImage): (Double, Double, Double) = {
    val (r, g, b, n) = channelSums(img)
    (r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** L1-normalized luminance histogram over real pixels — the default image
    * embedding for [[graft.ops.Similarity]] consumers. Luma = ITU-R BT.601
    * integer approximation (77R+150G+29B)>>8, bucketed into `bins`. */
  def lumaHistogram(img: BufferedImage, bins: Int = 16): Array[Float] = {
    val hist = new Array[Float](bins)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val l = luma(img.getRGB(x, y))
        hist(math.min(bins - 1, l * bins / 256)) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.max(1L, img.getWidth.toLong * img.getHeight).toFloat
    var i = 0
    while (i < bins) { hist(i) /= n; i += 1 }
    hist
  }

  /** Deterministic box-filter resize: each output pixel is the integer-mean
    * of its source box. Chosen over `Graphics2D.drawImage` because the
    * result is an exact rational of the inputs — reproducible across JVMs
    * and assertable in specs. */
  def boxResize(img: BufferedImage, outW: Int, outH: Int): BufferedImage = {
    require(outW > 0 && outH > 0, "resize dims must be positive")
    val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
    val w = img.getWidth; val h = img.getHeight
    var oy = 0
    while (oy < outH) {
      val y0 = oy * h / outH; val y1 = math.max(y0 + 1, (oy + 1) * h / outH)
      var ox = 0
      while (ox < outW) {
        val x0 = ox * w / outW; val x1 = math.max(x0 + 1, (ox + 1) * w / outW)
        var r = 0L; var g = 0L; var b = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        out.setRGB(ox, oy, (((r / n).toInt & 0xFF) << 16) |
          (((g / n).toInt & 0xFF) << 8) | ((b / n).toInt & 0xFF))
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** 8×8 grayscale thumbnail (box-resized luma) — the basis for both
    * perceptual hashes. */
  def grayThumb(img: BufferedImage): Array[Int] = {
    val small = boxResize(img, 8, 8)
    val out = new Array[Int](64)
    var i = 0
    while (i < 64) {
      out(i) = luma(small.getRGB(i % 8, i / 8))
      i += 1
    }
    out
  }

  /** Average hash: bit i = thumb(i) > mean. Robust to re-encode/resize;
    * Hamming distance ≤ ~5 ⇒ likely near-duplicate. */
  def aHash(img: BufferedImage): Long = {
    val t = grayThumb(img)
    val mean = t.sum.toDouble / 64
    var h = 0L; var i = 0
    while (i < 64) { if (t(i) > mean) h |= 1L << i; i += 1 }
    h
  }

  /** Difference hash over a 9×8 luma grid: bit = left < right. More robust
    * than aHash to global brightness shifts. */
  def dHash(img: BufferedImage): Long = {
    val small = boxResize(img, 9, 8)
    def l(x: Int, y: Int): Int = luma(small.getRGB(x, y))
    var h = 0L; var i = 0
    while (i < 64) {
      if (l(i % 8, i / 8) < l(i % 8 + 1, i / 8)) h |= 1L << i
      i += 1
    }
    h
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Encode to PNG (lossless) or JPEG bytes. */
  def encode(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, bos), s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Decode ALL frames (animated GIF / multi-page TIFF; single-frame
    * formats yield one). None if undecodable. The real basis for video-ish
    * frame sampling: each frame is a full raster, usable by every
    * pixel-level operator above.
    *
    * Known limitation (documented, not hidden): frames are the reader's raw
    * per-frame rasters. Optimized animated GIFs that store later frames as
    * delta patches (smaller rect + disposal metadata) yield those patches,
    * not composited full frames — compositing needs the per-frame IIOMetadata
    * offsets/disposal codes. Fixture GIFs ([[encodeGif]]) and multi-page
    * TIFFs are always full frames. */
  def frames(bytes: Array[Byte]): Option[IndexedSeq[BufferedImage]] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          if (n <= 0) None else Some((0 until n).map(r.read))
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Encode frames as an animated GIF (fixture generator for frame-sampling
    * specs/queries; GIF is palette-based, so patterns with ≤256 distinct
    * colors round-trip losslessly). */
  def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    import javax.imageio.IIOImage
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Deterministic synthetic test pattern — pure integer function of (x, y,
    * seed), so any pixel statistic is analytically computable (see
    * [[expectedPatternSums]]). Used by specs and the `m_image_pixel_stats`
    * oracle query; PNG-encoding it round-trips bit-exactly. */
  def testPattern(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + y * 3 + seed * 11) % 256
        val g = (x * 5 + seed * 17) % 256
        val b = (y * 13 + seed * 23) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Analytic channel sums of [[testPattern]] — computed straight from the
    * formula with no image code, so oracle comparisons against the decode
    * path are independent. */
  def expectedPatternSums(w: Int, h: Int, seed: Int): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r += (x * 7 + y * 3 + seed * 11) % 256
        g += (x * 5 + seed * 17) % 256
        b += (y * 13 + seed * 23) % 256
        x += 1
      }
      y += 1
    }
    (r, g, b)
  }
}
