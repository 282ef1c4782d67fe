package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** EXIF GPS walk against synthetic JPEGs built byte-by-byte (both endian
  * variants) — no imaging library exists here to produce fixtures, which is
  * exactly why the parser exists (SURVEY §7 Phase 4). */
class ExifSpec extends AnyFunSuite {

  /** Minimal JPEG: SOI + APP1(Exif TIFF with GPS IFD). */
  private def jpegWithGps(
      latDeg: Int, latMin: Int, latSec10k: Long, latRef: Char,
      lonDeg: Int, lonMin: Int, lonSec10k: Long, lonRef: Char,
      little: Boolean): Array[Byte] = {
    val order = if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val tiff = ByteBuffer.allocate(128).order(order)
    // TIFF header
    tiff.put(if (little) "II".getBytes else "MM".getBytes)
    tiff.putShort(42)
    tiff.putInt(8)                 // IFD0 offset
    // IFD0: one entry (GPS pointer), gps IFD at 26
    tiff.putShort(1)
    tiff.putShort(0x8825.toShort); tiff.putShort(4); tiff.putInt(1); tiff.putInt(26)
    tiff.putInt(0)                 // next IFD
    // GPS IFD @26: 4 entries; rational data at 80 / 104
    tiff.putShort(4)
    tiff.putShort(1); tiff.putShort(2); tiff.putInt(2)
    tiff.put(latRef.toByte); tiff.put(0.toByte); tiff.putShort(0)
    tiff.putShort(2); tiff.putShort(5); tiff.putInt(3); tiff.putInt(80)
    tiff.putShort(3); tiff.putShort(2); tiff.putInt(2)
    tiff.put(lonRef.toByte); tiff.put(0.toByte); tiff.putShort(0)
    tiff.putShort(4); tiff.putShort(5); tiff.putInt(3); tiff.putInt(104)
    tiff.putInt(0)                 // next IFD
    // lat rationals @80
    tiff.position(80)
    tiff.putInt(latDeg); tiff.putInt(1)
    tiff.putInt(latMin); tiff.putInt(1)
    tiff.putInt(latSec10k.toInt); tiff.putInt(10000)
    // lon rationals @104
    tiff.putInt(lonDeg); tiff.putInt(1)
    tiff.putInt(lonMin); tiff.putInt(1)
    tiff.putInt(lonSec10k.toInt); tiff.putInt(10000)

    val app1Len = 2 + 6 + 128
    val out = ByteBuffer.allocate(2 + 2 + app1Len)
    out.put(0xFF.toByte); out.put(0xD8.toByte)          // SOI
    out.put(0xFF.toByte); out.put(0xE1.toByte)          // APP1
    out.put((app1Len >> 8).toByte); out.put((app1Len & 0xFF).toByte)
    out.put("Exif".getBytes); out.put(0.toByte); out.put(0.toByte)
    out.put(tiff.array())
    out.array()
  }

  test("little-endian JPEG: southern/western hemisphere decimal degrees") {
    // 33°27'36.0000"S, 70°40'12.0000"W
    val bytes = jpegWithGps(33, 27, 360000L, 'S', 70, 40, 120000L, 'W', little = true)
    val gps = Exif.gpsFromJpeg(bytes)
    assert(gps.isDefined)
    assert(math.abs(gps.get.lat - -(33 + 27 / 60.0 + 36.0 / 3600)) < 1e-9)
    assert(math.abs(gps.get.lon - -(70 + 40 / 60.0 + 12.0 / 3600)) < 1e-9)
  }

  test("big-endian JPEG parses identically") {
    val le = Exif.gpsFromJpeg(jpegWithGps(12, 3, 45000L, 'N', 7, 8, 90000L, 'E', little = true))
    val be = Exif.gpsFromJpeg(jpegWithGps(12, 3, 45000L, 'N', 7, 8, 90000L, 'E', little = false))
    assert(le.isDefined && le === be)
    assert(le.get.lat > 12.0 && le.get.lon > 7.0)
  }

  test("malformed inputs return None, never throw") {
    assert(Exif.gpsFromJpeg(null).isEmpty)
    assert(Exif.gpsFromJpeg(Array[Byte]()).isEmpty)
    assert(Exif.gpsFromJpeg("not a jpeg".getBytes).isEmpty)
    assert(Exif.gpsFromJpeg(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty) // SOI+EOI
    val good = jpegWithGps(1, 2, 30000L, 'N', 4, 5, 60000L, 'E', little = true)
    assert(Exif.gpsFromJpeg(good.take(20)).isEmpty)  // truncated APP1
    // JPEG with APP1 but no GPS tag: flip the GPS-pointer tag id
    val noGps = good.clone()
    // IFD0 first-entry tag bytes sit at SOI+APP1hdr(4)+Exif(6)+tiffhdr(8)+count(2)=22
    noGps(22) = 0x11; noGps(23) = 0x11
    assert(Exif.gpsFromJpeg(noGps).isEmpty)
  }

  test("udf wrapper yields null struct for non-jpeg content") {
    import graft.SparkTestBase
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = Seq(
      (1L, jpegWithGps(10, 30, 0L, 'S', 71, 0, 0L, 'W', little = true)),
      (2L, "garbage".getBytes)
    ).toDF("id", "content")
    val out = df.select($"id", Exif.gpsUdf($"content").as("gps"))
      .select($"id", $"gps.lat", $"gps.lon")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }
}
