package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Pure-JVM GeoTIFF metadata extraction (no GDAL on the classpath — the
  * reference shells into gdal.Open for geotransform + dims,
  * script_geo.py:176-179). Same scoping philosophy as [[Exif]]: exactly the
  * tags the pipeline needs, None on anything malformed.
  *
  * Tags read: 256 ImageWidth, 257 ImageLength (SHORT or LONG),
  * 33550 ModelPixelScale (3×DOUBLE), 33922 ModelTiepoint (6×DOUBLE).
  * North-up GDAL-layout geotransform:
  * gt = (x0 - i·sx, sx, 0, y0 + j·sy, 0, -sy) for tiepoint (i,j,_,x0,y0,_).
  */
object GeoTiff {

  final case class RasterMeta(
      width: Int, height: Int,
      gt0: Double, gt1: Double, gt2: Double,
      gt3: Double, gt4: Double, gt5: Double) {
    def geotransform: Array[Double] = Array(gt0, gt1, gt2, gt3, gt4, gt5)
    /** Centroid of the 4-corner extent (rotation-free rasters). */
    def centroid: (Double, Double) =
      (gt0 + width / 2.0 * gt1, gt3 + height / 2.0 * gt5)
  }

  private def u8(b: Byte): Int = b & 0xFF

  /** Parse width/height/geotransform from bare TIFF bytes. */
  def metaFromTiff(b: Array[Byte]): Option[RasterMeta] = {
    if (b == null || b.length < 8) return None
    val little = b(0) == 'I' && b(1) == 'I'
    val big = b(0) == 'M' && b(1) == 'M'
    if (!little && !big) return None

    def in(p: Int, n: Int): Boolean = p >= 0 && p + n <= b.length
    def u16(p: Int): Int =
      if (little) u8(b(p)) | (u8(b(p + 1)) << 8) else (u8(b(p)) << 8) | u8(b(p + 1))
    def u32(p: Int): Long =
      if (little)
        u8(b(p)).toLong | (u8(b(p + 1)).toLong << 8) |
          (u8(b(p + 2)).toLong << 16) | (u8(b(p + 3)).toLong << 24)
      else
        (u8(b(p)).toLong << 24) | (u8(b(p + 1)).toLong << 16) |
          (u8(b(p + 2)).toLong << 8) | u8(b(p + 3)).toLong
    def f64(p: Int): Double = {
      var bits = 0L
      var k = 0
      while (k < 8) {
        val by = u8(b(p + k)).toLong
        bits |= (if (little) by << (8 * k) else by << (8 * (7 - k)))
        k += 1
      }
      java.lang.Double.longBitsToDouble(bits)
    }

    if (u16(2) != 42) return None
    val ifd = u32(4).toInt
    if (!in(ifd, 2)) return None
    val n = u16(ifd)

    var width = -1; var height = -1
    var scale: Option[(Double, Double)] = None
    var tie: Option[(Double, Double, Double, Double)] = None

    var k = 0
    while (k < n) {
      val e = ifd + 2 + 12 * k
      if (!in(e, 12)) return None
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
      def shortOrLong: Int =
        if (typ == 3) u16(e + 8) else u32(e + 8).toInt
      tag match {
        case 256 => width = shortOrLong
        case 257 => height = shortOrLong
        case 33550 if typ == 12 && cnt >= 2 =>
          val p = u32(e + 8).toInt
          if (in(p, 16)) scale = Some((f64(p), f64(p + 8)))
        case 33922 if typ == 12 && cnt >= 6 =>
          val p = u32(e + 8).toInt
          if (in(p, 48)) tie = Some((f64(p), f64(p + 8), f64(p + 24), f64(p + 32)))
        case _ =>
      }
      k += 1
    }
    for {
      (sx, sy) <- scale
      (i, j, x0, y0) <- tie
      if width > 0 && height > 0
    } yield RasterMeta(width, height,
      x0 - i * sx, sx, 0.0, y0 + j * sy, 0.0, -sy)
  }

  /** Column form: TIFF content → struct(cx, cy) extent centroid or null. */
  val centroidUdf: UserDefinedFunction = udf { (content: Array[Byte]) =>
    metaFromTiff(content).map { m => val (cx, cy) = m.centroid; Exif.Gps(cy, cx) }
  }
}
