package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** GeoTIFF tag walk against synthetic TIFFs built byte-by-byte (no GDAL in
  * this environment — which is why the parser exists, NOTES gap #4). */
class GeoTiffSpec extends AnyFunSuite {

  /** Minimal TIFF: header + IFD with width/height/ModelPixelScale/
    * ModelTiepoint; doubles parked after the IFD. */
  def tiffOf(width: Int, height: Int, sx: Double, sy: Double,
      x0: Double, y0: Double, little: Boolean): Array[Byte] = {
    val order = if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.allocate(512).order(order)
    buf.put(if (little) "II".getBytes else "MM".getBytes)
    buf.putShort(42)
    buf.putInt(8)                    // IFD at 8
    buf.position(8)
    buf.putShort(4)                  // 4 entries
    // 256 ImageWidth (SHORT)
    buf.putShort(256); buf.putShort(3); buf.putInt(1)
    if (little) { buf.putShort(width.toShort); buf.putShort(0) }
    else { buf.putShort(width.toShort); buf.putShort(0) }
    // 257 ImageLength (LONG)
    buf.putShort(257); buf.putShort(4); buf.putInt(1); buf.putInt(height)
    // 33550 ModelPixelScale: 3 doubles @ 200
    buf.putShort(33550.toShort); buf.putShort(12); buf.putInt(3); buf.putInt(200)
    // 33922 ModelTiepoint: 6 doubles @ 224
    buf.putShort(33922.toShort); buf.putShort(12); buf.putInt(6); buf.putInt(224)
    buf.putInt(0)                    // next IFD
    buf.position(200)
    buf.putDouble(sx); buf.putDouble(sy); buf.putDouble(0.0)
    buf.position(224)
    buf.putDouble(0.0); buf.putDouble(0.0); buf.putDouble(0.0) // raster point i,j,k
    buf.putDouble(x0); buf.putDouble(y0); buf.putDouble(0.0)   // model point x,y,z
    buf.array()
  }

  test("little-endian: geotransform and centroid from scale+tiepoint") {
    val m = GeoTiff.metaFromTiff(tiffOf(100, 80, 0.5, 0.5, 1000.0, 2000.0, little = true))
    assert(m.isDefined)
    val r = m.get
    assert(r.width === 100 && r.height === 80)
    assert(r.geotransform.toSeq === Seq(1000.0, 0.5, 0.0, 2000.0, 0.0, -0.5))
    // centroid: x0 + w/2*sx = 1025, y0 - h/2*sy = 1980
    assert(r.centroid === ((1025.0, 1980.0)))
  }

  test("big-endian parses identically") {
    val le = GeoTiff.metaFromTiff(tiffOf(64, 32, 0.1, 0.2, 5.0, 9.0, little = true))
    val be = GeoTiff.metaFromTiff(tiffOf(64, 32, 0.1, 0.2, 5.0, 9.0, little = false))
    assert(le.isDefined && le === be)
  }

  test("wrong byte order endianness-dependent fields: SHORT width read correctly") {
    // big-endian SHORT in the value field is left-justified per TIFF spec —
    // our builder writes it at the field start for both orders, matching
    // common writers; the parser reads the first 2 bytes in file order
    val be = GeoTiff.metaFromTiff(tiffOf(300, 200, 1.0, 1.0, 0.0, 0.0, little = false))
    assert(be.exists(_.width === 300))
  }

  test("malformed inputs → None") {
    assert(GeoTiff.metaFromTiff(null).isEmpty)
    assert(GeoTiff.metaFromTiff("JFIF junk".getBytes).isEmpty)
    assert(GeoTiff.metaFromTiff(tiffOf(10, 10, 1, 1, 0, 0, little = true).take(40)).isEmpty)
    // plain TIFF without geo tags: build by truncating tag count to 2
    val t = tiffOf(10, 10, 1, 1, 0, 0, little = true)
    val le = ByteBuffer.wrap(t).order(ByteOrder.LITTLE_ENDIAN)
    le.putShort(8, 2.toShort) // only width/height entries remain visible
    assert(GeoTiff.metaFromTiff(t).isEmpty)
  }

  test("pipeline integration: TIFF bytes locate the image without gt columns") {
    val spark = graft.SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val predios = Seq((10L, Seq((1000.0, 1900.0), (1100.0, 1900.0), (1100.0, 2000.0), (1000.0, 2000.0)),
      "C10", "Fundo", "S1", "EU", "1"))
      .toDF("predioId", "pts", "CODIGO", "NOMBRE", "SECCION", "TIPOUSO", "APL")
      .select($"predioId",
        transform($"pts", p => struct(p.getField("_1").as("x"), p.getField("_2").as("y"))).as("ring"),
        $"CODIGO", $"NOMBRE", $"SECCION", $"TIPOUSO", $"APL")
    // extent centroid (1025, 1980) sits inside the parcel
    val images = Seq(("lake/r/ortho.tif",
      tiffOf(100, 80, 0.5, 0.5, 1000.0, 2000.0, little = true)))
      .toDF("path", "content")
    val out = graft.pipelines.Pipelines.ingestClassify(images, predios, cellSize = 100.0)
      .select("method", "INDICE", "cx", "cy").collect().head
    assert(out.getString(0) === "contains")
    assert(out.getString(1) === "C10_S1_EU_1")
    assert(out.getDouble(2) === 1025.0 && out.getDouble(3) === 1980.0)
  }
}
