package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial join operators (SURVEY.md J2/J3/J4): grid-bucketed
  * point-in-polygon containment, nearest-vertex 1-NN fallback, and the
  * combined containment-first classification pipeline (the reference's
  * intended semantics — its actual code always falls through to 1-NN,
  * §2.3 bug 1).
  *
  * Scale design: the naive containment join is points × polygons (the
  * reference's O(P·V) per-image loop). Here both sides are bucketed into
  * grid cells (J4 rewrite): points map to exactly one cell, polygons are
  * replicated per bbox-overlapped cell, and the join is a plain equi-join
  * on the cell id — broadcastable when the parcel side is dim-sized,
  * shuffle-partitioned otherwise. Each candidate pair then runs the exact
  * native ray-casting test once. A (point, polygon) pair can meet in at
  * most one cell — the point's — so no post-join dedup is needed.
  */
object SpatialJoin {

  /** Grid-bucketed point-in-polygon join (inner). `points` must carry
    * (xCol, yCol); `polys` a ring column. Returns matched rows with both
    * sides' columns. cellSize should be on the order of a typical polygon
    * bbox edge: too small replicates polygons, too large floods candidates.
    */
  def pointInPolygonJoin(
      points: DataFrame, polys: DataFrame,
      xCol: String, yCol: String, ringCol: String,
      cellSize: Double, broadcastPolys: Boolean = true): DataFrame = {
    val pts = points.withColumn("__cell", Geo.pointCell(col(xCol), col(yCol), cellSize))
    val pls0 = polys.withColumn("__cell", explode(Geo.bboxCells(col(ringCol), cellSize)))
    val pls = if (broadcastPolys) broadcast(pls0) else pls0
    pts.join(pls, Seq("__cell"))
      .filter(PointInPolygon.contains(col(ringCol), col(xCol), col(yCol)))
      .drop("__cell")
  }

  /** J3: nearest-vertex 1-NN join — for every point, the polygon owning the
    * globally nearest vertex (script_geo.py:92-105 semantics, with the owner
    * carried through the argmin instead of the reference's float-equality
    * re-join, F9). Vertex side is exploded once and broadcast (dim-sized);
    * the per-point argmin is a partial aggregate — no shuffle of the point
    * side beyond the final group, and ties break on (distance, polygon id)
    * for determinism.
    */
  def nearestVertexJoin(
      points: DataFrame, polys: DataFrame,
      xCol: String, yCol: String, ringCol: String, polyIdCol: String): DataFrame = {
    val verts = polys.select(col(polyIdCol).as("__pid"), explode(col(ringCol)).as("__v"))
      .select(col("__pid"), col("__v.x").as("__vx"), col("__v.y").as("__vy"))
    val d2 = Geo.sqDist(col(xCol), col(yCol), col("__vx"), col("__vy"))
    points.join(broadcast(verts))
      .groupBy(points.columns.map(col): _*)
      .agg(min_by(
        struct(col("__pid").as("nn_poly"), col("__vx").as("nn_x"), col("__vy").as("nn_y"),
          d2.as("nn_d2")),
        struct(d2, col("__pid"))).as("__nn"))
      .select(points.columns.map(col) :+ col("__nn.nn_poly") :+ col("__nn.nn_x")
        :+ col("__nn.nn_y") :+ col("__nn.nn_d2"): _*)
  }

  /** E1 classification core, intended semantics (SURVEY §2.3 bugs 1-2 fixed):
    * containment first (grid-bucketed J2), nearest-vertex fallback for points
    * in no polygon (J3), `INDICE` sentinel for points with null coordinates.
    * Output: every input point exactly once, with (method, matched polygon id).
    */
  def classify(
      points: DataFrame, polys: DataFrame,
      idCol: String, xCol: String, yCol: String,
      ringCol: String, polyIdCol: String, cellSize: Double): DataFrame = {
    val located = points.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val unlocated = points.filter(col(xCol).isNull || col(yCol).isNull)
      .select(col(idCol), lit(null).cast("long").as("poly_id"),
        lit("unclassifiable").as("method"))

    // a point inside N overlapping polygons matches N times in the inner
    // containment join; keep exactly one row per point (min polygon id —
    // deterministic) so the exactly-once output contract holds
    val contained = pointInPolygonJoin(located, polys, xCol, yCol, ringCol, cellSize)
      .select(col(idCol), col(polyIdCol).cast("long").as("poly_id"))
      .groupBy(col(idCol))
      .agg(min("poly_id").as("poly_id"))
      .select(col(idCol), col("poly_id"), lit("contains").as("method"))
    // points with no containing polygon → 1-NN fallback
    val fallback = nearestVertexJoin(
      located.join(contained.select(col(idCol)), Seq(idCol), "left_anti"),
      polys, xCol, yCol, ringCol, polyIdCol)
      .select(col(idCol), col("nn_poly").cast("long").as("poly_id"),
        lit("nearest").as("method"))

    contained.unionByName(fallback).unionByName(unlocated)
  }

  /** The reference's composite business key (script_geo.py:197):
    * `CODIGO_SECCION_TIPOUSO_APL`, or the unclassifiable sentinel
    * (script_geo.py:199). */
  def indice(codigo: Column, seccion: Column, tipouso: Column, apl: Column,
      method: Column): Column =
    when(method === "unclassifiable", lit("IMAGEN NO CLASIFICABLE"))
      .otherwise(concat_ws("_", codigo, seccion, tipouso, apl))
}
