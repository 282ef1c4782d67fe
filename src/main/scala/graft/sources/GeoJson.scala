package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8: JSON geometry source — the reference loads per-parcel rodal polygon
  * JSON files one-by-one (json.load at script_geo.py:193-195); here a
  * json-lines scan with an explicit schema (no inference in production
  * paths, §1.5) keeps file identity via input_file_name().
  *
  * Expected line shape (one polygon per line):
  * {"id": 7, "properties": {"CODIGO": "...", ...},
  *  "coordinates": [[x, y], [x, y], ...]}
  */
object GeoJson {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("coordinates", ArrayType(
      ArrayType(DoubleType, containsNull = false), containsNull = false))))

  /** Read polygon JSON-lines into the engine ring representation
    * (`array<struct<x,y>>`), keeping the source file path. Extra coordinate
    * dimensions beyond x,y are truncated (F4 — rev_geoext semantics). */
  def readPolygons(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.schema(schema).json(pathGlob)
      .select(
        input_file_name().as("source_file"),
        col("id"),
        col("properties"),
        transform(col("coordinates"), p =>
          struct(element_at(p, 1).as("x"), element_at(p, 2).as("y"))).as("ring"))
}
