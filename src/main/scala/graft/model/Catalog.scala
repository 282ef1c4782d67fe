package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Typed catalog model (SURVEY.md §1.1): the reference's MySQL `CATALOG`
  * schema re-expressed as explicit StructTypes over Parquet — fixed,
  * declared, never inferred (§1.5). FECHA is upgraded from stringified
  * datetime to TimestampType.
  */
object Catalog {

  /** CATALOG.CATALOG — one row per cataloged image/artifact
    * (mysql_process.py:48, value list script_geo.py:204). */
  case class CatalogRow(
      ID: Long,
      INDICE: String,
      CODIGO: String,
      NOMBRE_PREDIO: String,
      SECCION: String,
      ESPECIE: String,
      APL: Double,
      ID_TIPO_IMG: Int,
      ID_PROCESO: Int,
      RUTA_RESULTADO: String,
      FECHA: Timestamp)

  val catalogSchema: StructType = StructType(Seq(
    StructField("ID", LongType, nullable = false),
    StructField("INDICE", StringType),
    StructField("CODIGO", StringType),
    StructField("NOMBRE_PREDIO", StringType),
    StructField("SECCION", StringType),
    StructField("ESPECIE", StringType),
    StructField("APL", DoubleType),
    StructField("ID_TIPO_IMG", IntegerType, nullable = false),
    StructField("ID_PROCESO", IntegerType, nullable = false),
    StructField("RUTA_RESULTADO", StringType),
    StructField("FECHA", TimestampType)))

  /** CATALOG.PROC_EJECUCION — one row per pipeline run
    * (mysql_process.py:28-43). */
  case class ProcEjecucion(ID_EJECUCION: Long, ID_PROCESO: Int, FECHA: Timestamp)

  val procEjecucionSchema: StructType = StructType(Seq(
    StructField("ID_EJECUCION", LongType, nullable = false),
    StructField("ID_PROCESO", IntegerType, nullable = false),
    StructField("FECHA", TimestampType)))

  /** CATALOG.DETALLE_EJECUCION — run ⟷ image lineage bridge
    * (mysql_process.py:49,54-55). */
  case class DetalleEjecucion(ID_EJECUCION: Long, ID_IMAGEN_FUENTE: Long)

  val detalleEjecucionSchema: StructType = StructType(Seq(
    StructField("ID_EJECUCION", LongType, nullable = false),
    StructField("ID_IMAGEN_FUENTE", LongType, nullable = false)))

  /** Image-type enum (ID_TIPO_IMG): observed values. */
  object TipoImg {
    val RawJpeg = 0      // script_geo.py:169
    val GeoTiff = 3      // script_geo.py:174
    val ModelArtifact = 10 // download_list_images.py:103
  }

  /** Producing-process enum (ID_PROCESO). */
  object Proceso {
    val Ingest = 0           // script_geo.py:164
    val ModelPublication = 2 // download_list_images.py:89
  }
}

/** Typed projection of lineitem for the Dataset-API surface (Encoders). */
case class LineitemSlim(l_orderkey: Long, l_returnflag: String, l_quantity: Double)
