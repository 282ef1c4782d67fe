package graft.geo

import graft.GraftSuite
import org.apache.spark.sql.functions._

class SpatialJoinSpec extends GraftSuite {
  import spark.implicits._

  // two parcels: unit squares at [0,2]² and [4,6]×[0,2]
  private lazy val polys = Seq(
    (10L, Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))),
    (20L, Seq((4.0, 0.0), (6.0, 0.0), (6.0, 2.0), (4.0, 2.0)))
  ).toDF("pid", "pts")
    .select($"pid",
      transform($"pts", p => struct(p.getField("_1").as("x"), p.getField("_2").as("y")))
        .as("ring"))

  private lazy val points = Seq(
    (1L, Some(1.0), Some(1.0)),   // inside parcel 10
    (2L, Some(5.0), Some(1.5)),   // inside parcel 20
    (3L, Some(3.0), Some(1.0)),   // gap between parcels → NN fallback
    (4L, Some(2.9), Some(1.0)),   // gap, nearer parcel 10's right edge
    (5L, None, None)              // no coords → unclassifiable
  ).toDF("id", "px", "py")

  test("pointInPolygonJoin: containment matches, gap points excluded") {
    val out = SpatialJoin.pointInPolygonJoin(
      points.filter($"px".isNotNull), polys, "px", "py", "ring", cellSize = 2.0)
      .select("id", "pid").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 10L), (2L, 20L)))
  }

  test("grid-bucketed join equals naive cross-join containment") {
    val naive = points.filter($"px".isNotNull).crossJoin(polys)
      .filter(PointInPolygon.contains($"ring", $"px", $"py"))
      .select("id", "pid").as[(Long, Long)].collect().toSet
    for (cell <- Seq(0.5, 1.0, 3.0, 10.0)) {
      val bucketed = SpatialJoin.pointInPolygonJoin(
        points.filter($"px".isNotNull), polys, "px", "py", "ring", cellSize = cell)
        .select("id", "pid").as[(Long, Long)].collect().toSet
      assert(bucketed === naive, s"cellSize=$cell")
    }
  }

  test("nearestVertexJoin: nearest vertex owner wins, ties break on poly id") {
    val out = SpatialJoin.nearestVertexJoin(
      points.filter($"px".isNotNull), polys, "px", "py", "ring", "pid")
      .select("id", "nn_poly").as[(Long, Long)].collect().toMap
    assert(out(3L) === 10L) // equidistant to (2,0)/(2,2) of 10 and (4,0)/(4,2) of 20? no:
    // (3,1): d² to 10's (2,0)=2, (2,2)=2; to 20's (4,0)=2, (4,2)=2 → tie → min pid
    assert(out(4L) === 10L) // strictly nearer to 10's right edge vertices
  }

  test("classify: containment first, NN fallback, unclassifiable sentinel") {
    val out = SpatialJoin.classify(
      points, polys, "id", "px", "py", "ring", "pid", cellSize = 2.0)
      .select("id", "poly_id", "method")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getString(2)))).toMap
    assert(out(1L) === ((Some(10L), "contains")))
    assert(out(2L) === ((Some(20L), "contains")))
    assert(out(3L) === ((Some(10L), "nearest")))
    assert(out(4L) === ((Some(10L), "nearest")))
    assert(out(5L) === ((None, "unclassifiable")))
    assert(out.size === 5)
  }

  test("classify: a point in N overlapping polygons emits exactly one row") {
    // two coincident unit squares both containing (1,1)
    val overlapping = Seq(
      (10L, Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0))),
      (11L, Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
    ).toDF("pid", "pts")
      .select($"pid",
        transform($"pts", p => struct(p.getField("_1").as("x"), p.getField("_2").as("y")))
          .as("ring"))
    val out = SpatialJoin.classify(
      points, overlapping, "id", "px", "py", "ring", "pid", cellSize = 2.0)
      .select("id", "poly_id", "method").collect()
    assert(out.length === 5, "every input point exactly once")
    val p1 = out.filter(_.getLong(0) == 1L)
    assert(p1.length === 1)
    assert(p1.head.getLong(1) === 10L && p1.head.getString(2) === "contains")
  }

  test("indice: composite key and sentinel (script_geo.py:197,199)") {
    val df = Seq(
      ("C1", "S2", "PINO", "7", "contains"),
      ("C1", "S2", "PINO", "7", "unclassifiable")
    ).toDF("c", "s", "t", "a", "m")
    val out = df.select(SpatialJoin.indice($"c", $"s", $"t", $"a", $"m"))
      .as[String].collect().toSeq
    assert(out === Seq("C1_S2_PINO_7", "IMAGEN NO CLASIFICABLE"))
  }
}
