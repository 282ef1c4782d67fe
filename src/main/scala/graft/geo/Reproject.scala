package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{transform => atransform, udf}

/** F3: UTM ↔ WGS84 geographic conversion, hand-written Snyder series (no
  * proj library on the classpath — SURVEY §7 hard list #1). Reference
  * behavior: EPSG:32718 (UTM 18S) → EPSG:4326 (script_geo.py:33-61).
  *
  * Accuracy: standard 6th-order series, sub-cm within a zone (series truncation grows toward zone edges); validated by
  * the exact central-meridian/equator anchor plus forward∘inverse round-trip
  * properties (< 1e-7 deg) in ReprojectSpec — there is no proj oracle in
  * this environment.
  *
  * The scalar math is a plain Scala UDF (not codegen): reprojection is a
  * per-vertex O(1) cost on dimension-sized data (parcel rings at load time),
  * never on the per-image hot path.
  */
object Reproject {

  private val A = 6378137.0                 // WGS84 semi-major
  private val F = 1.0 / 298.257223563      // flattening
  private val K0 = 0.9996
  private val E2 = F * (2 - F)
  private val EP2 = E2 / (1 - E2)
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  /** Central meridian of a UTM zone, radians. */
  private def lon0(zone: Int): Double = math.toRadians(-183.0 + 6.0 * zone)

  /** (lon°, lat°) → (easting, northing) in the given UTM zone. */
  def wgs84ToUtm(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lon)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = A / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = EP2 * cosP * cosP
    val a0 = cosP * (lam - lon0(zone))
    val m = A * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * phi
      - (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * phi)
      + (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * phi)
      - (35 * E2 * E2 * E2 / 3072) * math.sin(6 * phi))
    val x = K0 * n * (a0 + (1 - t + c) * a0 * a0 * a0 / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * math.pow(a0, 5) / 120) + FalseEasting
    val y = K0 * (m + n * tanP * (a0 * a0 / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(a0, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * math.pow(a0, 6) / 720))
    (x, if (south) y + FalseNorthingSouth else y)
  }

  /** (easting, northing) in the given UTM zone → (lon°, lat°). */
  def utmToWgs84(e: Double, n: Double, zone: Int, south: Boolean): (Double, Double) = {
    val x = e - FalseEasting
    val y = if (south) n - FalseNorthingSouth else n
    val m = y / K0
    val mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP1 = math.sin(phi1); val cosP1 = math.cos(phi1); val tanP1 = math.tan(phi1)
    val c1 = EP2 * cosP1 * cosP1
    val t1 = tanP1 * tanP1
    val n1 = A / math.sqrt(1 - E2 * sinP1 * sinP1)
    val r1 = A * (1 - E2) / math.pow(1 - E2 * sinP1 * sinP1, 1.5)
    val d = x / (n1 * K0)
    val lat = phi1 - (n1 * tanP1 / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1)
        * math.pow(d, 6) / 720)
    val lon = lon0(zone) + (d - (1 + 2 * t1 + c1) * d * d * d / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1)
        * math.pow(d, 5) / 120) / cosP1
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  case class LonLat(x: Double, y: Double)

  /** UTM 18S → WGS84 lon/lat as a point struct (the reference's fixed zone,
    * script_geo.py:43-44). */
  val utm18sToWgs84: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (e: Double, n: Double) =>
      val (lon, lat) = utmToWgs84(e, n, 18, south = true)
      LonLat(lon, lat)
    }

  /** Reproject every vertex of a UTM ring to lon/lat (load-time dim prep). */
  def reprojectRing(ring: Column): Column =
    atransform(ring, p => {
      val ll = utm18sToWgs84(p.getField("x"), p.getField("y"))
      org.apache.spark.sql.functions.struct(
        ll.getField("x").as("x"), ll.getField("y").as("y"))
    })
}
