package graft.geo

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One polygon edge (consecutive vertex pair, ring closure included). */
case class Edge(x1: Double, y1: Double, x2: Double, y2: Double)

/** Shoelace accumulation state: twice-signed-area, weighted coordinate sums,
  * plus a plain vertex mean for the degenerate (zero-area) fallback. */
case class CentroidBuf(a2: Double, sx: Double, sy: Double, n: Long, mx: Double, my: Double)

/** A5: area-weighted polygon centroid as a typed `Aggregator` over edge rows
  * (the one genuinely custom UDAF in the engine, SURVEY §7).
  *
  * Input is the polygon's edge set (order-free: each edge contributes an
  * independent cross-product term), so the aggregation is fully commutative/
  * associative — partial aggregation and any shuffle order give identical
  * sums up to float reordering; exactness is not required here because the
  * result never feeds an oracle hash (ScalaTest-verified instead).
  *
  * Degenerate polygons (collinear, |area| = 0) fall back to the vertex mean
  * of edge start points — matching [[Geo.ringCentroid]].
  */
object CentroidAgg extends Aggregator[Edge, CentroidBuf, (Double, Double)] {

  override def zero: CentroidBuf = CentroidBuf(0.0, 0.0, 0.0, 0L, 0.0, 0.0)

  override def reduce(b: CentroidBuf, e: Edge): CentroidBuf = {
    val cross = e.x1 * e.y2 - e.x2 * e.y1
    CentroidBuf(
      b.a2 + cross,
      b.sx + (e.x1 + e.x2) * cross,
      b.sy + (e.y1 + e.y2) * cross,
      b.n + 1, b.mx + e.x1, b.my + e.y1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
    CentroidBuf(a.a2 + b.a2, a.sx + b.sx, a.sy + b.sy,
      a.n + b.n, a.mx + b.mx, a.my + b.my)

  override def finish(r: CentroidBuf): (Double, Double) =
    if (r.a2 != 0.0) (r.sx / (3.0 * r.a2), r.sy / (3.0 * r.a2))
    else if (r.n > 0) (r.mx / r.n, r.my / r.n)
    else (Double.NaN, Double.NaN)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
}
