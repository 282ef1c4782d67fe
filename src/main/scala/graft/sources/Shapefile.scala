package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** S7: ESRI shapefile source — minimal pure-JVM parser for the reference's
  * cadastral input (fiona.open at script_geo.py:143-144), closing the gap
  * SURVEY §2.1/S7 originally documented as out of scope.
  *
  * Scope: .shp shape types 5/15/25 (Polygon/Z/M — Z/M coords are dropped,
  * the reference's rev_geoext does the same truncation, F4) and 3/13/23
  * (PolyLine family), plus .dbf (dBase III) attributes with Character,
  * Numeric, Float and Logical fields. Each polygon PART becomes one ring
  * row — the reference's ring-merging bug (§1.2) is NOT reproduced; ring
  * identity is preserved via (record, part) indices.
  *
  * Format facts used (public ESRI whitepaper layout): .shp = 100-byte
  * big-endian header (code 9994, file length in 16-bit words) with
  * little-endian bbox; records = BE (number, content-length) + LE shape
  * body; polygon body = type, bbox, numParts, numPoints, part offsets,
  * xy pairs. .dbf = LE header (record count, header/record sizes), 32-byte
  * field descriptors terminated by 0x0D, records of fixed-width ASCII
  * fields prefixed by a deletion flag.
  */
object Shapefile {

  final case class ShapeRing(recordNo: Int, partNo: Int, ring: Seq[(Double, Double)])

  /** Parse polygon/polyline rings from .shp bytes. */
  def parseShp(bytes: Array[Byte]): Seq[ShapeRing] = {
    require(bytes.length >= 100, "not a shapefile: truncated header")
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, "not a shapefile: bad magic")
    val fileLenBytes = be.getInt(24) * 2
    val out = Seq.newBuilder[ShapeRing]
    var pos = 100
    while (pos + 8 <= math.min(fileLenBytes, bytes.length)) {
      val recNo = be.getInt(pos)
      val contentLen = be.getInt(pos + 4) * 2
      val body = ByteBuffer.wrap(bytes, pos + 8, contentLen).order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = body.getInt(body.position())
      if (Set(3, 5, 13, 15, 23, 25).contains(shapeType)) {
        val b = pos + 8
        def i32(off: Int) =
          ByteBuffer.wrap(bytes, b + off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        def f64(off: Int) =
          ByteBuffer.wrap(bytes, b + off, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
        val numParts = i32(36)
        val numPoints = i32(40)
        val partsOff = 44
        val pointsOff = partsOff + 4 * numParts
        val partStarts = (0 until numParts).map(k => i32(partsOff + 4 * k))
        val partEnds = partStarts.drop(1) :+ numPoints
        partStarts.zip(partEnds).zipWithIndex.foreach { case ((from, until), part) =>
          val ring = (from until until).map { p =>
            (f64(pointsOff + 16 * p), f64(pointsOff + 16 * p + 8))
          }
          out += ShapeRing(recNo, part, ring)
        }
      }
      pos += 8 + contentLen
    }
    out.result()
  }

  final case class DbfField(name: String, typ: Char, len: Int)

  /** Parse dBase III attribute rows from .dbf bytes: (fields, rows of
    * string/double/boolean/null keyed by PHYSICAL 1-based record number —
    * deleted rows are skipped but still counted, so record numbers stay
    * aligned with .shp record numbers, which count all records). */
  def parseDbf(bytes: Array[Byte]): (Seq[DbfField], Seq[(Int, Seq[Any])]) = {
    require(bytes.length >= 32, "not a dbf: truncated header")
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerSize = le.getShort(8) & 0xFFFF
    val recSize = le.getShort(10) & 0xFFFF
    val fields = Seq.newBuilder[DbfField]
    var p = 32
    while (p + 32 <= headerSize && bytes(p) != 0x0D) {
      val name = new String(bytes, p, 11, "ASCII").takeWhile(_ != 0).trim
      fields += DbfField(name, bytes(p + 11).toChar, bytes(p + 16) & 0xFF)
      p += 32
    }
    val fs = fields.result()
    val rows = (0 until nRec).flatMap { r =>
      val base = headerSize + r.toLong * recSize
      if (base + recSize > bytes.length) None
      else if (bytes(base.toInt) == '*') None // deleted row (counted, not emitted)
      else {
        var off = base.toInt + 1
        Some((r + 1) -> fs.map { f =>
          val raw = new String(bytes, off, f.len, "ASCII").trim
          off += f.len
          f.typ match {
            case 'N' | 'F' => if (raw.isEmpty) null else raw.toDouble
            case 'L' => if (raw.isEmpty || raw == "?") null else "YyTt".contains(raw.head)
            case _ => raw
          }
        })
      }
    }
    (fs, rows)
  }

  val ringSchema: StructType = StructType(Seq(
    StructField("record_no", IntegerType, nullable = false),
    StructField("part_no", IntegerType, nullable = false),
    StructField("ring", ArrayType(StructType(Seq(
      StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false))), containsNull = false))))

  /** Distributed read: binaryFile scan over .shp paths → ring rows (one per
    * polygon part). Join with [[readDbf]] on (path, record_no) for
    * attributes. */
  def readShp(spark: org.apache.spark.sql.SparkSession, pathGlob: String): DataFrame = {
    val bin = BinarySource.readBinary(spark, pathGlob, Some("*.shp"))
    val outSchema = StructType(StructField("path", StringType) +: ringSchema.fields.toSeq)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = bin.schema.fieldIndex("path")
    val cIdx = bin.schema.fieldIndex("content")
    bin.mapPartitions { rows =>
      rows.flatMap { r =>
        parseShp(r.getAs[Array[Byte]](cIdx)).map { s =>
          Row(r.getString(pIdx), s.recordNo, s.partNo,
            s.ring.map { case (x, y) => Row(x, y) })
        }
      }
    }(enc)
  }

  /** Distributed read of .dbf attributes: all fields as strings (typed cast
    * is the caller's schema decision), keyed by (path, record_no). */
  def readDbf(spark: org.apache.spark.sql.SparkSession, pathGlob: String): DataFrame = {
    val bin = BinarySource.readBinary(spark, pathGlob, Some("*.dbf"))
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("record_no", IntegerType, nullable = false),
      StructField("attrs", MapType(StringType, StringType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val pIdx = bin.schema.fieldIndex("path")
    val cIdx = bin.schema.fieldIndex("content")
    bin.mapPartitions { rows =>
      rows.flatMap { r =>
        val (fields, recs) = parseDbf(r.getAs[Array[Byte]](cIdx))
        recs.map { case (recNo, rec) =>
          Row(r.getString(pIdx), recNo,
            fields.map(_.name).zip(rec.map(v => if (v == null) null else v.toString)).toMap)
        }
      }
    }(enc)
  }
}
