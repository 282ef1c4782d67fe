package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Pure-math suite (no Spark): anchors, round-trips, scale sanity.
  * No proj library exists in this environment, so correctness rests on
  * (a) the exact central-meridian/equator anchor, (b) forward∘inverse
  * identity over a dense deterministic grid, (c) known meridian-arc/scale
  * magnitudes.
  */
class ReprojectSpec extends AnyFunSuite {

  test("anchor: central meridian × equator is exact") {
    // UTM 18S: E=500000 on the central meridian (-75°), N=10,000,000 at the equator
    val (lon, lat) = Reproject.utmToWgs84(500000.0, 10000000.0, 18, south = true)
    assert(math.abs(lon - -75.0) < 1e-9)
    assert(math.abs(lat - 0.0) < 1e-9)
    val (e, n) = Reproject.wgs84ToUtm(-75.0, 0.0, 18, south = true)
    assert(math.abs(e - 500000.0) < 1e-6)
    assert(math.abs(n - 10000000.0) < 1e-6)
  }

  test("meridian arc: 1 degree of latitude ≈ 110.57 km at the equator") {
    val (_, n1) = Reproject.wgs84ToUtm(-75.0, -1.0, 18, south = true)
    assert(math.abs((10000000.0 - n1) / 1000.0 - 110.57) < 0.05)
  }

  test("easting grows east, northing grows north (southern hemisphere)") {
    val (e1, n1) = Reproject.wgs84ToUtm(-74.0, -10.0, 18, south = true)
    val (e2, n2) = Reproject.wgs84ToUtm(-73.5, -9.5, 18, south = true)
    assert(e2 > e1 && e1 > 500000.0)
    assert(n2 > n1 && n1 < 10000000.0)
  }

  test("k0 scale at central meridian: 0.9996 exactly") {
    val (_, nA) = Reproject.wgs84ToUtm(-75.0, -45.0, 18, south = true)
    val (_, nB) = Reproject.wgs84ToUtm(-75.0, -45.001, 18, south = true)
    // meridian distance for 0.001° at 45°S ≈ 111.132 m; projected = k0 × that
    val projected = nA - nB
    val geodesic = 111.1319 // metres per 0.001° at 45°, WGS84 meridian radius
    assert(math.abs(projected / geodesic - 0.9996) < 1e-4)
  }

  test("property: forward∘inverse identity within 1e-7 degrees across zone 18S") {
    // dense deterministic grid: lon ∈ zone 18 ±3°, lat across the southern hemisphere
    for (lon <- BigDecimal(-78.0) to BigDecimal(-72.0) by 0.25;
         lat <- BigDecimal(-56.0) to BigDecimal(-0.5) by 0.5) {
      val (e, n) = Reproject.wgs84ToUtm(lon.toDouble, lat.toDouble, 18, south = true)
      val (lon2, lat2) = Reproject.utmToWgs84(e, n, 18, south = true)
      assert(math.abs(lon2 - lon.toDouble) < 1e-7 && math.abs(lat2 - lat.toDouble) < 1e-7,
        s"round trip failed at ($lon, $lat) -> ($e, $n) -> ($lon2, $lat2)")
    }
  }

  test("property: inverse∘forward identity within 2cm across in-zone range") {
    for (e <- BigDecimal(200000.0) to BigDecimal(800000.0) by 23000.0;
         n <- BigDecimal(3800000.0) to BigDecimal(9900000.0) by 101000.0) {
      val (e0, n0) = (e.toDouble, n.toDouble)
      val (lon, lat) = Reproject.utmToWgs84(e0, n0, 18, south = true)
      val (e2, n2) = Reproject.wgs84ToUtm(lon, lat, 18, south = true)
      assert(math.abs(e2 - e0) < 0.02 && math.abs(n2 - n0) < 0.02,
        s"round trip failed at ($e0, $n0) -> ($lon, $lat) -> ($e2, $n2)")
    }
  }

  test("reference quirk check: zone 18 central meridian is -75°, matching EPSG:32718") {
    // script_geo.py reprojects EPSG:32718 → EPSG:4326; all in-zone longitudes
    // must invert into (-78, -72)
    val (lonW, _) = Reproject.utmToWgs84(166021.44, 5000000.0, 18, south = true)
    val (lonE, _) = Reproject.utmToWgs84(833978.56, 5000000.0, 18, south = true)
    assert(lonW > -81.1 && lonW < -75.0)
    assert(lonE > -75.0 && lonE < -68.9)
  }
}
