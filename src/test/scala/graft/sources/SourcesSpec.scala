package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.GraftSuite
import org.apache.spark.sql.functions._

class SourcesSpec extends GraftSuite {
  import spark.implicits._

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("explodeZip: entries become rows; bad archives yield none") {
    val df = Seq(
      ("a.zip", zipOf("x/1.jpg" -> "one", "x/2.jpg" -> "two")),
      ("b.zip", zipOf("y/3.tif" -> "three")),
      ("broken.zip", "notazip".getBytes)
    ).toDF("path", "content")
    val out = Archives.explodeZip(df)
      .collect().map(r => (r.getString(0), r.getString(1),
        new String(r.getAs[Array[Byte]](2)))).toSet
    assert(out === Set(
      ("a.zip", "x/1.jpg", "one"), ("a.zip", "x/2.jpg", "two"),
      ("b.zip", "y/3.tif", "three")))
  }

  /** Minimal .shp: header + one polygon record with two rings (outer+inner). */
  private def shpOf(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val numPoints = rings.map(_.size).sum
    val contentLen = 4 + 32 + 4 + 4 + 4 * rings.size + 16 * numPoints
    val total = 100 + 8 + contentLen
    val buf = ByteBuffer.allocate(total)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(0, 9994)
    buf.putInt(24, total / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(32, 1000)
    buf.putInt(36, 5) // polygon
    // record header (BE)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(100, 1)
    buf.putInt(104, contentLen / 2)
    // record body (LE)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val b = 108
    buf.putInt(b, 5)
    // bbox ignored by parser
    buf.putInt(b + 36, rings.size)
    buf.putInt(b + 40, numPoints)
    var start = 0
    rings.zipWithIndex.foreach { case (r, k) =>
      buf.putInt(b + 44 + 4 * k, start); start += r.size
    }
    val ptsOff = b + 44 + 4 * rings.size
    rings.flatten.zipWithIndex.foreach { case ((x, y), p) =>
      buf.putDouble(ptsOff + 16 * p, x)
      buf.putDouble(ptsOff + 16 * p + 8, y)
    }
    buf.array()
  }

  test("parseShp: rings preserved separately (no §1.2 ring merging)") {
    val outer = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))
    val hole = Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))
    val shapes = Shapefile.parseShp(shpOf(Seq(outer, hole)))
    assert(shapes.size === 2)
    assert(shapes.map(_.partNo) === Seq(0, 1))
    assert(shapes(0).ring === outer)
    assert(shapes(1).ring === hole)
    assert(shapes.forall(_.recordNo === 1))
  }

  /** Minimal dBase III: two fields, two records (one deleted). */
  private def dbfOf(): Array[Byte] = {
    val fields = Seq(("CODIGO", 'C', 8), ("APL", 'N', 6))
    val headerSize = 32 + 32 * fields.size + 1
    val recSize = 1 + fields.map(_._3).sum
    val buf = ByteBuffer.allocate(headerSize + recSize * 3).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, 0x03.toByte)
    buf.putInt(4, 3)
    buf.putShort(8, headerSize.toShort)
    buf.putShort(10, recSize.toShort)
    fields.zipWithIndex.foreach { case ((n, t, l), i) =>
      val off = 32 + 32 * i
      n.getBytes.zipWithIndex.foreach { case (c, j) => buf.put(off + j, c) }
      buf.put(off + 11, t.toByte)
      buf.put(off + 16, l.toByte)
    }
    buf.put(headerSize - 1, 0x0D.toByte)
    def rec(i: Int, flag: Char, codigo: String, apl: String): Unit = {
      val off = headerSize + recSize * i
      buf.put(off, flag.toByte)
      (codigo.padTo(8, ' ') + apl.reverse.padTo(6, ' ').reverse).getBytes.zipWithIndex
        .foreach { case (c, j) => buf.put(off + 1 + j, c) }
    }
    rec(0, ' ', "CO06097", "    12")
    rec(1, '*', "DELETED", "    99")
    rec(2, ' ', "CO06098", "     7")
    buf.array()
  }

  test("parseDbf: typed fields, deleted rows skipped but counted") {
    val (fields, rows) = Shapefile.parseDbf(dbfOf())
    assert(fields.map(f => (f.name, f.typ)) === Seq(("CODIGO", 'C'), ("APL", 'N')))
    // record numbers are physical positions (deleted row 2 still counts),
    // keeping (path, record_no) aligned with .shp record numbers
    assert(rows === Seq(1 -> Seq("CO06097", 12.0), 3 -> Seq("CO06098", 7.0)))
  }

  test("readShp + classify integration: shapefile parcels drive the PIP join") {
    val dir = java.nio.file.Files.createTempDirectory("shp").toFile
    val f = new java.io.File(dir, "predios.shp")
    java.nio.file.Files.write(f.toPath,
      shpOf(Seq(Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)))))
    val rings = Shapefile.readShp(spark, dir.getAbsolutePath)
    val collected = rings.collect()
    assert(collected.length === 1)
    val ring = collected.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ring")
    assert(ring.size === 5)
    // drive the spatial join with the parsed ring
    val polys = rings.selectExpr("record_no AS pid", "ring")
    val pts = Seq((1L, 1.0, 1.0), (2L, 5.0, 5.0)).toDF("id", "px", "py")
    val matched = graft.geo.SpatialJoin.pointInPolygonJoin(
      pts, polys, "px", "py", "ring", 2.0)
      .select("id", "pid").as[(Long, Int)].collect().toSet
    assert(matched === Set((1L, 1)))
  }

  test("GeoJson source: explicit schema, ring struct, file identity (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("gj").toFile
    val f = new java.io.File(dir, "rodales.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"id": 7, "properties": {"CODIGO": "CO1", "APL": "2"}, "coordinates": [[0.0,0.0],[2.0,0.0],[2.0,2.0],[0.0,2.0]]}
        |{"id": 8, "properties": {"CODIGO": "CO2"}, "coordinates": [[4.0,0.0,99.0],[6.0,0.0,99.0],[6.0,2.0,99.0]]}
        |""".stripMargin)
    val df = GeoJson.readPolygons(spark, dir.getAbsolutePath)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("source_file").endsWith("rodales.json"))
    assert(rows(0).getAs[Map[String, String]]("properties")("CODIGO") === "CO1")
    val ring = rows(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ring")
    assert(ring.map(r => (r.getDouble(0), r.getDouble(1))) ===
      Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
    // z coords truncated (F4)
    val ring2 = rows(1).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ring")
    assert(ring2.map(_.size).forall(_ == 2))
    // parsed rings drive the containment kernel directly
    val hit = df.filter($"id" === 7)
      .select(graft.geo.PointInPolygon.contains($"ring", lit(1.0), lit(1.0)))
      .as[Boolean].collect().head
    assert(hit)
  }

  test("explodeZip strict mode surfaces malformed archives (§2.3.4)") {
    val df = Seq(("bad.zip", "junk".getBytes)).toDF("path", "content")
    val ex = intercept[org.apache.spark.SparkException] {
      Archives.explodeZip(df, strict = true).collect()
    }
    assert(ex.getMessage != null)
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc_rt")
      .toFile.getAbsolutePath + "/t"
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq
      === src.orderBy("n_nationkey").collect().toSeq)
    // predicate reaches the ORC scan (PushedFilters), not a post-scan Filter only
    val plan = back.filter(col("n_regionkey") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)]"),
      s"filter not pushed:\n$plan")
  }
}
