package graft.sources

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Pure-JVM EXIF GPS extraction from JPEG bytes (SURVEY.md §7 Phase 4
  * hard item #2 — no imaging libraries on the classpath; reference uses
  * PIL._getexif at script_geo.py:170-171).
  *
  * Scope: exactly the reference's need — GPS latitude/longitude (+ refs)
  * from the APP1/TIFF tag walk. Everything else in EXIF is ignored. Returns
  * None on any malformed structure (no exceptions on the data path).
  */
object Exif {

  final case class Gps(lat: Double, lon: Double)

  private val ExifHeader = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  private def u8(b: Byte): Int = b & 0xFF

  /** Extract (lat, lon) in signed decimal degrees from JPEG bytes. */
  def gpsFromJpeg(bytes: Array[Byte]): Option[Gps] = {
    if (bytes == null || bytes.length < 4 ||
      u8(bytes(0)) != 0xFF || u8(bytes(1)) != 0xD8) return None
    var i = 2
    while (i + 4 <= bytes.length) {
      if (u8(bytes(i)) != 0xFF) return None
      val marker = u8(bytes(i + 1))
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / start-of-scan
      val len = (u8(bytes(i + 2)) << 8) | u8(bytes(i + 3))
      if (len < 2 || i + 2 + len > bytes.length) return None
      if (marker == 0xE1 && len >= 10 &&
        (0 until 6).forall(k => bytes(i + 4 + k) == ExifHeader(k))) {
        return gpsFromTiff(bytes, i + 10, i + 2 + len)
      }
      i += 2 + len
    }
    None
  }

  /** TIFF walk: IFD0 → GPS IFD pointer (tag 0x8825) → GPS lat/lon tags. */
  private def gpsFromTiff(b: Array[Byte], tiff: Int, end: Int): Option[Gps] = {
    if (tiff + 8 > end) return None
    val little = b(tiff) == 'I' && b(tiff + 1) == 'I'
    val big = b(tiff) == 'M' && b(tiff + 1) == 'M'
    if (!little && !big) return None

    def in(p: Int, n: Int): Boolean = p >= tiff && p + n <= end
    def u16(p: Int): Int =
      if (little) u8(b(p)) | (u8(b(p + 1)) << 8)
      else (u8(b(p)) << 8) | u8(b(p + 1))
    def u32(p: Int): Long =
      if (little)
        u8(b(p)).toLong | (u8(b(p + 1)).toLong << 8) |
          (u8(b(p + 2)).toLong << 16) | (u8(b(p + 3)).toLong << 24)
      else
        (u8(b(p)).toLong << 24) | (u8(b(p + 1)).toLong << 16) |
          (u8(b(p + 2)).toLong << 8) | u8(b(p + 3)).toLong

    if (!in(tiff + 2, 2) || u16(tiff + 2) != 42) return None
    val ifd0 = tiff + u32(tiff + 4).toInt
    if (!in(ifd0, 2)) return None

    /** Find an entry's (type, count, valueField position) in an IFD. */
    def findTag(ifd: Int, tag: Int): Option[(Int, Long, Int)] = {
      if (!in(ifd, 2)) return None
      val n = u16(ifd)
      var k = 0
      while (k < n) {
        val e = ifd + 2 + 12 * k
        if (!in(e, 12)) return None
        if (u16(e) == tag) return Some((u16(e + 2), u32(e + 4), e + 8))
        k += 1
      }
      None
    }

    /** RATIONAL[3] (deg, min, sec) at the entry's offset → decimal degrees. */
    def dms(valuePos: Int): Option[Double] = {
      val p = tiff + u32(valuePos).toInt // 3 rationals never fit inline
      if (!in(p, 24)) return None
      def rat(q: Int): Double = {
        val den = u32(q + 4)
        if (den == 0L) 0.0 else u32(q).toDouble / den.toDouble
      }
      Some(rat(p) + rat(p + 8) / 60.0 + rat(p + 16) / 3600.0)
    }

    /** ASCII ref char ("N"/"S"/"E"/"W"): count<=4 → inline in value field. */
    def refChar(valuePos: Int): Option[Char] = Some(b(valuePos).toChar)

    for {
      (_, _, gpsPtr) <- findTag(ifd0, 0x8825)
      gpsIfd = tiff + u32(gpsPtr).toInt
      (_, _, latRefPos) <- findTag(gpsIfd, 0x0001)
      latRef <- refChar(latRefPos)
      (t2, c2, latPos) <- findTag(gpsIfd, 0x0002) if t2 == 5 && c2 == 3
      lat <- dms(latPos)
      (_, _, lonRefPos) <- findTag(gpsIfd, 0x0003)
      lonRef <- refChar(lonRefPos)
      (t4, c4, lonPos) <- findTag(gpsIfd, 0x0004) if t4 == 5 && c4 == 3
      lon <- dms(lonPos)
    } yield Gps(
      if (latRef == 'S') -lat else lat,
      if (lonRef == 'W') -lon else lon)
  }

  /** Column form: binary JPEG content → struct(lat, lon) or null. */
  val gpsUdf: UserDefinedFunction = udf { (content: Array[Byte]) =>
    gpsFromJpeg(content)
  }
}
