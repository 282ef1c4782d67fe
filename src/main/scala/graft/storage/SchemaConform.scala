package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Writer-side SCHEMA ENFORCEMENT for lake appends — Delta's write
  * contract: an append to an existing table must conform to the table's
  * schema, or explicitly opt into evolution with `mergeSchema=true`.
  *
  * Without enforcement, a writer with a typo'd or renamed column
  * commits silently and the read-side footer merge surfaces the drift
  * as a new mostly-null column — corruption that is only discovered at
  * query time, possibly much later. With it:
  *
  *  - columns MISSING from the incoming frame are null-filled at the
  *    table's type (nullable-append semantics — safe by construction);
  *  - EXTRA columns are an error unless `mergeSchema = true`, in which
  *    case they commit and the table schema widens (the read path
  *    already merges footers by name; old rows read null);
  *  - same-named columns with a DIFFERENT type are cast when the cast
  *    is lossless (`Cast.canUpCast` — int→long, float→double, ...) and
  *    refused otherwise (a long→int append would truncate silently).
  *
  * Output column order is table-schema order, extras appended last, so
  * staged parquet layouts stay stable across writers. */
object SchemaConform {

  /** Conform `df` for appending to `table` (no-op when the table does
    * not exist yet — the first write defines the schema). */
  def conform(spark: SparkSession, root: String, table: String,
      df: DataFrame, mergeSchema: Boolean): DataFrame =
    GraftLake.table(spark, root, table).map(_.schema) match {
      case None => df
      case Some(target) => conformTo(target, df, mergeSchema,
        s"append to '$table'")
    }

  /** [[conform]] against an explicit target schema. */
  def conformTo(target: StructType, df: DataFrame, mergeSchema: Boolean,
      what: String): DataFrame = {
    val dTypes = df.schema.map(f => f.name -> f.dataType).toMap
    val tNames = target.fieldNames.toSet
    val extra = df.schema.fieldNames.filterNot(tNames)
    if (extra.nonEmpty && !mergeSchema)
      throw new IllegalArgumentException(
        s"$what: columns ${extra.mkString(", ")} are not in the table " +
          s"schema (${target.fieldNames.mkString(", ")}). Set option " +
          "mergeSchema=true to evolve the schema, or drop the columns.")
    val cols = target.map { f =>
      dTypes.get(f.name) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(dt) if Cast.canUpCast(dt, f.dataType) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(dt) =>
          throw new IllegalArgumentException(
            s"$what: column ${f.name} is $dt but the table declares " +
              s"${f.dataType}, and the cast is not lossless; cast " +
              "explicitly if the narrowing is intended")
      }
    } ++ extra.map(col(_))
    df.select(cols: _*)
  }
}
