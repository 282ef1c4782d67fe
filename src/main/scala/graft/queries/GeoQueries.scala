package graft.queries

import graft.{QueryDef, QueryGroup, Tables}
import graft.geo.{Geo, Reproject, SpatialJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial kernel queries (SURVEY.md §2.1 J2/J3/J4, F2/F3/F10, A5).
  *
  * The test lake has no geometry, so geometry is derived deterministically
  * from it — the same arithmetic on both engines: customers become points in
  * (0,10)², nations become a 5×5 grid of 2×2 parcels (rings for Spark's
  * ray-casting kernel, BETWEEN bounds for the DuckDB oracle — equivalent for
  * strictly-interior points, and the derived coordinates can never land on a
  * parcel edge). The oracle thus checks the full grid-bucketed containment
  * join and argmin fallback against an independent formulation.
  */
object GeoQueries extends QueryGroup {

  /** customers → points: px ∈ (0,10) stepping .01, never integral. */
  private def points(s: SparkSession, d: String, scale: Double = 1.0): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      (((col("c_custkey") % 1000) + 0.5) / 100.0 * scale).as("px"),
      (((col("c_custkey") * 7 % 1000) + 0.5) / 100.0 * scale).as("py"))

  private def pointsSql(scale: String = "1.0") =
    s"""SELECT c_custkey,
       |  ((c_custkey % 1000) + 0.5) / 100.0 * $scale AS px,
       |  ((c_custkey * 7 % 1000) + 0.5) / 100.0 * $scale AS py
       |FROM customer""".stripMargin

  /** nations → 5×5 grid of 2×2 parcel rings. */
  private def parcels(s: SparkSession, d: String): DataFrame = {
    val i = (col("n_nationkey") % 5).cast("double")
    val j = floor(col("n_nationkey") / 5.0).cast("double")
    Tables.nation(s, d).select(
      col("n_nationkey"), col("n_name"), col("n_regionkey"),
      array(
        Geo.point(i * 2, j * 2), Geo.point(i * 2 + 2, j * 2),
        Geo.point(i * 2 + 2, j * 2 + 2), Geo.point(i * 2, j * 2 + 2)).as("ring"))
  }

  private val parcelBoundsSql =
    """SELECT n_nationkey, n_name, n_regionkey,
      |  2.0 * (n_nationkey % 5) AS xmin, 2.0 * (n_nationkey % 5) + 2 AS xmax,
      |  2.0 * (n_nationkey // 5) AS ymin, 2.0 * (n_nationkey // 5) + 2 AS ymax
      |FROM nation""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // J2+J4: grid-bucketed point-in-polygon containment join (native
    // ray-casting per candidate; oracle = interval-containment join).
    QueryDef(
      "g_pip_grid_join",
      (s, d) =>
        SpatialJoin.pointInPolygonJoin(
            points(s, d), parcels(s, d), "px", "py", "ring", cellSize = 2.0)
          .select(col("c_custkey"), col("n_nationkey").as("parcel"), col("px"), col("py"))
          .orderBy("c_custkey"),
      Some(s"""WITH pts AS (${pointsSql()}), cells AS ($parcelBoundsSql)
              |SELECT c_custkey, n_nationkey AS parcel, px, py
              |FROM pts JOIN cells
              |  ON px > xmin AND px < xmax AND py > ymin AND py < ymax
              |ORDER BY c_custkey""".stripMargin)),

    // J3: 1-NN argmin join to parcel centers (min_by over struct(d², id)).
    QueryDef(
      "g_nn_centroid_join",
      (s, d) => {
        val centers = Tables.nation(s, d).select(
          col("n_nationkey"),
          array(Geo.point(
            (col("n_nationkey") % 5).cast("double") * 2 + 1,
            floor(col("n_nationkey") / 5.0).cast("double") * 2 + 1)).as("ring"))
        SpatialJoin.nearestVertexJoin(points(s, d), centers, "px", "py", "ring", "n_nationkey")
          .select(col("c_custkey"), col("nn_poly"), col("nn_d2"))
          .orderBy("c_custkey")
      },
      Some(s"""WITH pts AS (${pointsSql()}),
              |cents AS (SELECT n_nationkey,
              |            2.0 * (n_nationkey % 5) + 1 AS cx,
              |            2.0 * (n_nationkey // 5) + 1 AS cy FROM nation),
              |d AS (SELECT c_custkey, n_nationkey,
              |        (px - cx) * (px - cx) + (py - cy) * (py - cy) AS d2
              |      FROM pts CROSS JOIN cents)
              |SELECT c_custkey, n_nationkey AS nn_poly, d2 AS nn_d2 FROM d
              |QUALIFY row_number() OVER (PARTITION BY c_custkey
              |                           ORDER BY d2, n_nationkey) = 1
              |ORDER BY c_custkey""".stripMargin)),

    // F2+A5: geotransform → 4-corner extent → centroid (vertex mean = area
    // centroid for rectangles).
    QueryDef(
      "g_extent_centroid",
      (s, d) => {
        val gt = array(
          (col("o_orderkey") % 100).cast("double"), lit(0.1), lit(0.0),
          (col("o_orderkey") % 50).cast("double"), lit(0.0), lit(-0.1))
        val cols = (lit(50) + col("o_orderkey") % 10).cast("double")
        val rows = (lit(40) + col("o_orderkey") % 5).cast("double")
        // scalar corner structs + explicit-fold centroid: bit-identical to
        // vertexMeanCentroid(extentCorners(...)) — the array-HOF aggregate
        // folds ((((0+x0)+x1)+x2)+x3)/4 and 0.0+x0 == x0 exactly — but
        // stays fully inside whole-stage codegen (the HOF path runs
        // interpreted lambdas, ~20µs/row)
        val c0 = Geo.gtCorner(gt, lit(0.0), lit(0.0))
        val c1 = Geo.gtCorner(gt, lit(0.0), rows)
        val c2 = Geo.gtCorner(gt, cols, rows)
        val c3 = Geo.gtCorner(gt, cols, lit(0.0))
        def mean4(f: String) =
          (c0.getField(f) + c1.getField(f) + c2.getField(f) + c3.getField(f)) / 4
        Tables.orders(s, d).select(
          col("o_orderkey"),
          c0.getField("x").as("x0"),
          c0.getField("y").as("y0"),
          c2.getField("x").as("x2"),
          c2.getField("y").as("y2"),
          mean4("x").as("cx"), mean4("y").as("cy"))
          .orderBy("o_orderkey")
      },
      Some("""WITH r AS (SELECT o_orderkey,
             |    CAST(o_orderkey % 100 AS DOUBLE) AS gx,
             |    CAST(o_orderkey % 50 AS DOUBLE) AS gy,
             |    CAST(50 + o_orderkey % 10 AS DOUBLE) AS cols,
             |    CAST(40 + o_orderkey % 5 AS DOUBLE) AS rows_
             |  FROM orders),
             |c AS (SELECT o_orderkey,
             |    gx + 0.0 * 0.1 + 0.0 * 0.0 AS x0, gy + 0.0 * 0.0 + 0.0 * -0.1 AS y0,
             |    gx + 0.0 * 0.1 + rows_ * 0.0 AS x1, gy + 0.0 * 0.0 + rows_ * -0.1 AS y1,
             |    gx + cols * 0.1 + rows_ * 0.0 AS x2, gy + cols * 0.0 + rows_ * -0.1 AS y2,
             |    gx + cols * 0.1 + 0.0 * 0.0 AS x3, gy + cols * 0.0 + 0.0 * -0.1 AS y3
             |  FROM r)
             |SELECT o_orderkey, x0, y0, x2, y2,
             |  (((x0 + x1) + x2) + x3) / 4 AS cx,
             |  (((y0 + y1) + y2) + y3) / 4 AS cy
             |FROM c ORDER BY o_orderkey""".stripMargin)),

    // E1 classification pipeline: containment-first, 1-NN vertex fallback
    // (points scaled ×1.2 so ~1/3 fall outside the grid), composite INDICE.
    QueryDef(
      "g_classify_pipeline",
      (s, d) => {
        val p = parcels(s, d)
        val cls = SpatialJoin.classify(
          points(s, d, scale = 1.2), p, "c_custkey", "px", "py",
          "ring", "n_nationkey", cellSize = 2.0)
        cls.join(broadcast(Tables.nation(s, d)),
            cls("poly_id") === col("n_nationkey"), "left")
          .select(
            col("c_custkey"), col("poly_id"), col("method"),
            SpatialJoin.indice(
              col("n_name"), col("n_regionkey"), lit("BOSQUE"), col("poly_id"),
              col("method")).as("indice"))
          .orderBy("c_custkey")
      },
      Some(s"""WITH pts AS (${pointsSql("1.2")}), cells AS ($parcelBoundsSql),
              |contained AS (
              |  SELECT c_custkey, n_nationkey, n_name, n_regionkey
              |  FROM pts JOIN cells
              |    ON px > xmin AND px < xmax AND py > ymin AND py < ymax),
              |verts AS (
              |  SELECT n_nationkey, n_name, n_regionkey, unnest([
              |    [xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]]) AS v
              |  FROM cells),
              |fallback AS (
              |  SELECT p.c_custkey, v.n_nationkey, v.n_name, v.n_regionkey
              |  FROM (SELECT * FROM pts WHERE c_custkey NOT IN
              |          (SELECT c_custkey FROM contained)) p
              |  CROSS JOIN verts v
              |  QUALIFY row_number() OVER (PARTITION BY p.c_custkey ORDER BY
              |    (px - v[1]) * (px - v[1]) + (py - v[2]) * (py - v[2]),
              |    v.n_nationkey) = 1)
              |SELECT c_custkey, CAST(n_nationkey AS BIGINT) AS poly_id,
              |  'contains' AS method,
              |  n_name || '_' || n_regionkey || '_BOSQUE_' || n_nationkey AS indice
              |FROM contained
              |UNION ALL
              |SELECT c_custkey, CAST(n_nationkey AS BIGINT), 'nearest',
              |  n_name || '_' || n_regionkey || '_BOSQUE_' || n_nationkey
              |FROM fallback
              |ORDER BY c_custkey""".stripMargin)),

    // F3: UTM 18S → WGS84 reprojection. Cross-engine oracle: the same
    // published Snyder inverse series (USGS PP 1395 §8, eqs 10-18..10-22)
    // independently re-coded as DuckDB SQL — two implementations of the
    // public formulas compared at 6 dp (~0.1 m), the same construction as
    // the haversine oracle. ReprojectSpec additionally proves the exact
    // central-meridian/equator anchors and forward∘inverse round trips.
    QueryDef(
      "g_reproject_utm18s",
      (s, d) => {
        val e = lit(300000.0) + (col("c_custkey") % 1000) * 400.0
        val n = lit(8000000.0) + (col("c_custkey") * 13 % 2000) * 500.0
        val ll = Reproject.utm18sToWgs84(e, n)
        Tables.customer(s, d).select(
          col("c_custkey"), e.as("easting"), n.as("northing"),
          round(ll.getField("x"), 6).as("lon"), round(ll.getField("y"), 6).as("lat"))
          .orderBy("c_custkey")
      },
      Some("""WITH const AS (SELECT
             |    6378137.0 AS a, 1.0/298.257223563 AS f),
             |c2 AS (SELECT a, f*(2-f) AS e2 FROM const),
             |c3 AS (SELECT a, e2, e2/(1-e2) AS ep2,
             |    (1-sqrt(1-e2))/(1+sqrt(1-e2)) AS e1 FROM c2),
             |pts AS (SELECT c_custkey,
             |    300000.0 + (c_custkey % 1000) * 400.0 AS easting,
             |    8000000.0 + (c_custkey * 13 % 2000) * 500.0 AS northing
             |  FROM customer),
             |s1 AS (SELECT pts.*, c3.*,
             |    easting - 500000.0 AS x,
             |    (northing - 10000000.0) / 0.9996 AS m FROM pts, c3),
             |s2 AS (SELECT *,
             |    m / (a*(1 - e2/4 - 3*e2*e2/64 - 5*e2*e2*e2/256)) AS mu FROM s1),
             |s3 AS (SELECT *, mu
             |    + (3*e1/2 - 27*e1*e1*e1/32) * sin(2*mu)
             |    + (21*e1*e1/16 - 55*pow(e1,4)/32) * sin(4*mu)
             |    + (151*e1*e1*e1/96) * sin(6*mu)
             |    + (1097*pow(e1,4)/512) * sin(8*mu) AS phi1 FROM s2),
             |s4 AS (SELECT *, sin(phi1) AS sp, cos(phi1) AS cp, tan(phi1) AS tp
             |  FROM s3),
             |s5 AS (SELECT *, ep2*cp*cp AS c1, tp*tp AS t1,
             |    a/sqrt(1 - e2*sp*sp) AS n1,
             |    a*(1-e2)/pow(1 - e2*sp*sp, 1.5) AS r1 FROM s4),
             |s6 AS (SELECT *, x/(n1*0.9996) AS d FROM s5),
             |s7 AS (SELECT c_custkey, easting, northing,
             |    degrees(radians(-75.0)
             |      + (d - (1 + 2*t1 + c1)*d*d*d/6
             |         + (5 - 2*c1 + 28*t1 - 3*c1*c1 + 8*ep2 + 24*t1*t1)
             |           * pow(d,5)/120) / cp) AS lon,
             |    degrees(phi1 - (n1*tp/r1)*(d*d/2
             |      - (5 + 3*t1 + 10*c1 - 4*c1*c1 - 9*ep2) * pow(d,4)/24
             |      + (61 + 90*t1 + 298*c1 + 45*t1*t1 - 252*ep2 - 3*c1*c1)
             |        * pow(d,6)/720)) AS lat
             |  FROM s6)
             |SELECT c_custkey, easting, northing,
             |  round(lon, 6) AS lon, round(lat, 6) AS lat
             |FROM s7 ORDER BY c_custkey""".stripMargin)),

    // F10 extra: haversine great-circle distance to a fixed reference point.
    QueryDef(
      "g_haversine",
      (s, d) => {
        val p = points(s, d)
        p.select(
          col("c_custkey"),
          round(Geo.haversineKm(col("px"), col("py"), lit(5.0), lit(5.0)), 4)
            .as("km_to_ref"))
          .orderBy("c_custkey")
      },
      Some(s"""WITH pts AS (${pointsSql()})
              |SELECT c_custkey,
              |  round(12742.0176 * asin(sqrt(
              |    sin(radians(5.0 - py) / 2) * sin(radians(5.0 - py) / 2)
              |    + cos(radians(py)) * cos(radians(5.0))
              |      * sin(radians(5.0 - px) / 2) * sin(radians(5.0 - px) / 2))), 4)
              |    AS km_to_ref
              |FROM pts ORDER BY c_custkey""".stripMargin))
  )
}
