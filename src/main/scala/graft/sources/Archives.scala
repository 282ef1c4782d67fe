package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** S2: archive expansion (extract_files, download_list_images.py:27-30).
  *
  * The reference unpacks archives on local disk between two bucket hops;
  * here a zip blob column explodes into one row per entry — a distributed
  * flatMap over partitions, no staging directory, no driver involvement.
  * Each zip is processed by exactly one task; parallelism comes from the
  * number of archives (the reference's layout: many per-flight archives),
  * not from within one archive — matching how zip's central directory
  * forces sequential entry reads anyway.
  */
object Archives {

  val entrySchema: StructType = StructType(Seq(
    StructField("archive", StringType),
    StructField("entry", StringType),
    StructField("content", BinaryType)))

  /** Explode zip blobs into (archive, entry, content) rows. Directory
    * entries are skipped; malformed archives yield zero rows (errors are
    * surfaced per §2.3.4 policy via the `strict` flag). */
  def explodeZip(zips: DataFrame, pathCol: String = "path",
      contentCol: String = "content", strict: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(entrySchema)
    val pIdx = zips.schema.fieldIndex(pathCol)
    val cIdx = zips.schema.fieldIndex(contentCol)
    zips.mapPartitions { rows =>
      rows.flatMap { r =>
        val path = r.getString(pIdx)
        val bytes = r.getAs[Array[Byte]](cIdx)
        // ZipInputStream is lenient (garbage → zero entries, no error), so
        // strict mode checks the PK signature explicitly
        val looksZip = bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K'
        if (!looksZip) {
          if (strict) throw new RuntimeException(s"malformed archive $path: no zip signature")
          Vector.empty
        } else try {
          val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
          Iterator.continually(zin.getNextEntry)
            .takeWhile(_ != null)
            .filterNot(_.isDirectory)
            .map { e => Row(path, e.getName, zin.readAllBytes()) }
            .toVector
        } catch {
          case ex: Exception if !strict =>
            Vector.empty // tolerate malformed archives; strict=true rethrows
          case ex: Exception =>
            throw new RuntimeException(s"malformed archive $path", ex)
        }
      }
    }(enc)
  }
}
