package graft.geo

import graft.GraftSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class GeoKernelSpec extends GraftSuite {
  import spark.implicits._

  private def ringDf(pts: Seq[(Double, Double)]) =
    Seq(1).toDF("id").select(
      array(pts.map { case (x, y) => struct(lit(x).as("x"), lit(y).as("y")) }: _*)
        .as("ring"))

  private def containsPt(ring: Seq[(Double, Double)], x: Double, y: Double): Boolean =
    ringDf(ring).select(PointInPolygon.contains($"ring", lit(x), lit(y)))
      .as[Boolean].collect().head

  private val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
  // concave "L": big square minus top-right quadrant
  private val ell = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))

  test("ray casting: interior/exterior of a square") {
    assert(containsPt(square, 2.0, 2.0))
    assert(containsPt(square, 0.1, 3.9))
    assert(!containsPt(square, -1.0, 2.0))
    assert(!containsPt(square, 5.0, 2.0))
    assert(!containsPt(square, 2.0, 4.5))
  }

  test("ray casting: concave polygon (L-shape)") {
    assert(containsPt(ell, 1.0, 3.0))  // in the vertical arm
    assert(containsPt(ell, 3.0, 1.0))  // in the horizontal arm
    assert(!containsPt(ell, 3.0, 3.0)) // in the notch
  }

  test("ray casting: winding direction irrelevant") {
    assert(containsPt(square.reverse, 2.0, 2.0))
    assert(!containsPt(square.reverse, 5.0, 5.0))
  }

  test("extent corners follow the reference's corner walk with a real geotransform") {
    // gt = (x0=100, pxw=0.5, 0, y0=200, 0, pxh=-0.5), 10 cols x 8 rows
    val df = Seq(1).toDF("id").select(
      Geo.extentCorners(
        array(lit(100.0), lit(0.5), lit(0.0), lit(200.0), lit(0.0), lit(-0.5)),
        lit(10.0), lit(8.0)).as("c"))
    val corners = df.select(explode($"c").as("p"))
      .select($"p.x", $"p.y").as[(Double, Double)].collect().toSeq
    // (0,0), (0,rows), (cols,rows), (cols,0) — script_geo.py:19-30 order
    assert(corners === Seq((100.0, 200.0), (100.0, 196.0), (105.0, 196.0), (105.0, 200.0)))
  }

  test("ringCentroid: square, L-shape (area-weighted), degenerate line") {
    def centroidOf(pts: Seq[(Double, Double)]): (Double, Double) = {
      val r = ringDf(pts).select(Geo.ringCentroid($"ring").as("c"))
        .select($"c.x", $"c.y").as[(Double, Double)].collect().head
      r
    }
    assert(centroidOf(square) === ((2.0, 2.0)))
    // L-shape: area 12; centroid = (16/3/ .. ) hand-computed:
    // split: [0,4]x[0,2] area 8 centroid (2,1); [0,2]x[2,4] area 4 centroid (1,3)
    // → ((8*2+4*1)/12, (8*1+4*3)/12) = (20/12, 20/12) = (5/3, 5/3)
    val (cx, cy) = centroidOf(ell)
    assert(math.abs(cx - 5.0 / 3) < 1e-12 && math.abs(cy - 5.0 / 3) < 1e-12)
    // degenerate: collinear ring falls back to vertex mean
    val (dx, dy) = centroidOf(Seq((0.0, 0.0), (2.0, 2.0), (4.0, 4.0)))
    assert(dx === 2.0 && dy === 2.0)
  }

  test("CentroidAgg aggregator matches ringCentroid on the L-shape") {
    val edges = (ell :+ ell.head).sliding(2).map {
      case Seq((x1, y1), (x2, y2)) => Edge(x1, y1, x2, y2)
    }.toSeq
    val ds = spark.createDataset(edges)
    val (cx, cy) = ds.select(CentroidAgg.toColumn).collect().head
    assert(math.abs(cx - 5.0 / 3) < 1e-12 && math.abs(cy - 5.0 / 3) < 1e-12)
  }

  test("CentroidAgg is partition-order independent") {
    val edges = (square :+ square.head).sliding(2).map {
      case Seq((x1, y1), (x2, y2)) => Edge(x1, y1, x2, y2)
    }.toSeq
    val a = spark.createDataset(edges).repartition(4).select(CentroidAgg.toColumn).collect().head
    val b = spark.createDataset(edges.reverse).select(CentroidAgg.toColumn).collect().head
    assert(a === ((2.0, 2.0)) && b === ((2.0, 2.0)))
  }

  test("bbox and grid cells") {
    val out = ringDf(ell)
      .select(Geo.bbox($"ring").as("b"), Geo.bboxCells($"ring", 2.0).as("cells"))
      .select($"b.xmin", $"b.ymax", size($"cells")).as[(Double, Double, Int)]
      .collect().head
    assert(out._1 === 0.0 && out._2 === 4.0)
    // bbox [0,4]x[0,4] at cell 2.0 → cells x∈{0,1,2}, y∈{0,1,2} = 9 (inclusive edges)
    assert(out._3 === 9)
  }

  test("haversine: quarter meridian ~ 10,007.5 km; zero distance") {
    val d = Seq(1).toDF("id").select(
      Geo.haversineKm(lit(0.0), lit(0.0), lit(0.0), lit(90.0)).as("q"),
      Geo.haversineKm(lit(12.5), lit(-33.0), lit(12.5), lit(-33.0)).as("z"))
      .as[(Double, Double)].collect().head
    assert(math.abs(d._1 - 10007.5) < 5.0)
    assert(d._2 === 0.0)
  }
}
