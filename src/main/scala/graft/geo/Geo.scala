package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry column functions (SURVEY.md §2.1 F2/F4/F10, §1.2 model).
  *
  * Representation: a ring is `array<struct<x:double, y:double>>`, implicitly
  * closed (last→first edge assumed); a multipolygon is an array of rings —
  * the reference's ring-merging quirk (script_geo.py:50-60 collapses holes)
  * is deliberately NOT reproduced (SURVEY §1.2).
  *
  * All functions are row-local column expressions — shuffle-free, and cheap
  * relative to the joins they feed.
  */
object Geo {

  def point(x: Column, y: Column): Column = struct(x.as("x"), y.as("y"))

  /** Squared planar distance — monotone in distance, exact doubles (diff*diff,
    * no pow), safe for argmin. */
  def sqDist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)

  /** Planar euclidean distance (matches the reference's shapely semantics on
    * lon/lat — planar, not geodesic; see haversineKm for the geodesic extra). */
  def dist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt(sqDist(x1, y1, x2, y2))

  /** Great-circle distance in km over WGS84 lon/lat degrees (engine extra). */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val h = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2 * 6371.0088) * asin(sqrt(h))
  }

  /** F2: affine geotransform corner — x = gt0 + px·gt1 + py·gt2,
    * y = gt3 + px·gt4 + py·gt5 (gt is array<double>[6], GDAL layout;
    * script_geo.py:25-26). getItem (GetArrayItem), not element_at: repeated
    * ElementAt over the same inline CreateArray trips a Spark
    * subexpression-elimination codegen bug ("isNull_N is not an rvalue" →
    * silent interpreter fallback), and GetArrayItem over a literal array is
    * also simplified away entirely by SimplifyExtractValueOps. */
  def gtCorner(gt: Column, px: Column, py: Column): Column =
    point(
      gt.getItem(0) + px * gt.getItem(1) + py * gt.getItem(2),
      gt.getItem(3) + px * gt.getItem(4) + py * gt.getItem(5))

  /** F2: 4-corner raster extent ring, corner order (0,0),(0,rows),
    * (cols,rows),(cols,0) exactly as the reference's GetExtent walk
    * (script_geo.py:19-30, incl. the yarr.reverse() order). */
  def extentCorners(gt: Column, cols: Column, rows: Column): Column =
    array(
      gtCorner(gt, lit(0.0), lit(0.0)),
      gtCorner(gt, lit(0.0), rows),
      gtCorner(gt, cols, rows),
      gtCorner(gt, cols, lit(0.0)))

  /** F4: drop z / extra fields from ring points: [x,y,z…] → [x,y]. */
  def ringXY(ring: Column): Column =
    transform(ring, p => point(p.getField("x"), p.getField("y")))

  /** Vertex-average centroid (exact for point clouds; equals the area
    * centroid for rectangles — A5 extent case). Sequential fold. */
  def vertexMeanCentroid(ring: Column): Column =
    point(
      aggregate(ring, lit(0.0), (acc, p) => acc + p.getField("x")) / size(ring),
      aggregate(ring, lit(0.0), (acc, p) => acc + p.getField("y")) / size(ring))

  /** A5: area-weighted polygon centroid (shoelace), implicit ring closure;
    * degenerate (zero-area) rings fall back to the vertex mean. */
  def ringCentroid(ring: Column): Column = {
    val n = size(ring)
    // fold over edge index i (1-based): edge (p_i, p_{i%n+1})
    val sums = aggregate(
      sequence(lit(1), n),
      struct(lit(0.0).as("a2"), lit(0.0).as("sx"), lit(0.0).as("sy")),
      (acc, i) => {
        val p = element_at(ring, i)
        val q = element_at(ring, when(i === n, 1).otherwise(i + 1))
        val cross = p.getField("x") * q.getField("y") - q.getField("x") * p.getField("y")
        struct(
          (acc.getField("a2") + cross).as("a2"),
          (acc.getField("sx") + (p.getField("x") + q.getField("x")) * cross).as("sx"),
          (acc.getField("sy") + (p.getField("y") + q.getField("y")) * cross).as("sy"))
      })
    when(sums.getField("a2") =!= 0.0,
      point(
        sums.getField("sx") / (lit(3.0) * sums.getField("a2")),
        sums.getField("sy") / (lit(3.0) * sums.getField("a2"))))
      .otherwise(vertexMeanCentroid(ring))
  }

  /** Axis-aligned bounding box of a ring. */
  def bbox(ring: Column): Column = {
    val xs = transform(ring, _.getField("x"))
    val ys = transform(ring, _.getField("y"))
    struct(
      array_min(xs).as("xmin"), array_min(ys).as("ymin"),
      array_max(xs).as("xmax"), array_max(ys).as("ymax"))
  }

  /** Grid cell id of a point (for the J4 grid-bucketed spatial join):
    * 1e6·cellX + cellY packed into one long equi-join key. */
  def pointCell(x: Column, y: Column, cellSize: Double): Column =
    floor(x / cellSize).cast("long") * 1000000L + floor(y / cellSize).cast("long")

  /** All grid cells overlapped by a ring's bbox (the polygon side of the J4
    * rewrite — each polygon is replicated once per overlapped cell). */
  def bboxCells(ring: Column, cellSize: Double): Column = {
    val b = bbox(ring)
    val cx0 = floor(b.getField("xmin") / cellSize).cast("long")
    val cx1 = floor(b.getField("xmax") / cellSize).cast("long")
    val cy0 = floor(b.getField("ymin") / cellSize).cast("long")
    val cy1 = floor(b.getField("ymax") / cellSize).cast("long")
    flatten(transform(sequence(cx0, cx1), cx =>
      transform(sequence(cy0, cy1), cy => cx * 1000000L + cy)))
  }
}
