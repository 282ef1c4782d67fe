package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Object-store / file sources (SURVEY.md §2.1 S1/S3/S5/S6).
  *
  * The reference's bucket-listing + per-file download loops
  * (download_list_images.py:17-38) collapse into one distributed
  * `binaryFile` scan: listing, fetch and parallelism are Spark's. Paths are
  * any Hadoop FS (file://, gs://, s3a://) — nothing here assumes local disk.
  */
object BinarySource {

  /** S1/S3: distributed binary scan. Rows: (path, modificationTime, length,
    * content). Globs express the reference's nested-dir walks
    * (two-level star patterns, image_list at download_list_images.py:32-38). */
  def readBinary(spark: SparkSession, pathGlob: String,
      pathFilter: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    pathFilter.fold(r)(g => r.option("pathGlobFilter", g)).load(pathGlob)
  }

  /** File name (last path segment) — `path.split('/')[-1]` as a column
    * (F5, download_list_images.py:59,63). */
  def fileName(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(split(path, "/"), -1)

  /** S5: data-lake key layout `{clase}{codigo}/{md5(content)}.{ext}` —
    * content-addressed (deterministic, idempotent re-ingest) instead of the
    * reference's `md5(urandom)` (download_list_images.py:45-50;
    * clase ∈ {BR/, TIF/} at script_geo.py:168,173). */
  def dataLakeKey(clase: org.apache.spark.sql.Column,
      codigo: org.apache.spark.sql.Column,
      content: org.apache.spark.sql.Column,
      origName: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(clase, codigo, lit("/"), md5(content), lit("."),
      regexp_extract(origName, "\\.([^.]+)$", 1))

  /** JPEG-vs-GeoTIFF dispatch predicate (P5) — an explicit format test
    * replacing the reference's exception-driven branch
    * (script_geo.py:166-189). */
  def isJpeg(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(path).rlike("\\.(jpg|jpeg)$")
}
