package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.{Geodesy, Wkt}

/** Geodesy control points + round-trip properties (SURVEY.md §7 "what's
  * hard" (a): Transverse Mercator without PROJ must be property-tested).
  * Properties run over a seeded sample grid (deterministic). */
class GeodesySpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)

  test("UTM zone / EPSG choice matches reference formula (load_to_postgis.py:18-20)") {
    assert(Geodesy.utmZone(25.38) == 35)          // Helsinki → zone 35
    assert(Geodesy.utmEpsg(25.38, 60.47) == 32635)
    assert(Geodesy.utmEpsg(-70.66, -33.45) == 32719) // Santiago → south
  }

  test("targetEpsg selection (F9): projected kept, geographic → UTM, none → 32635") {
    assert(Geodesy.targetEpsg(Some(32633), 0, 0) == 32633)
    assert(Geodesy.targetEpsg(Some(4326), 25.38, 60.47) == 32635)
    assert(Geodesy.targetEpsg(None, 0, 0) == 32635)
  }

  test("UTM control point: Helsinki (24.9384E, 60.1699N) in zone 35N") {
    // Ground truth from an independent 4th-order Krüger implementation
    // (Karney 2011 coefficients): E=385611.317, N=6672118.380.
    val (e, n) = Geodesy.utmForward(24.9384, 60.1699, 35, north = true)
    assert(math.abs(e - 385611.317) < 0.01, s"easting $e")
    assert(math.abs(n - 6672118.380) < 0.01, s"northing $n")
  }

  test("Web Mercator control point: (0,0) -> (0,0); lat 85.0511 -> ~20037508") {
    val (x0, y0) = Geodesy.webMercatorForward(0, 0)
    assert(math.abs(x0) < 1e-9 && math.abs(y0) < 1e-9)
    val (_, yTop) = Geodesy.webMercatorForward(0, 85.05112878)
    assert(math.abs(yTop - 20037508.34) < 1.0)
  }

  test("UTM round trip: |inverse(forward(p)) - p| < 1e-7 degrees in-zone") {
    (1 to 500).foreach { _ =>
      val lon = 27.0 + (rng.nextDouble() * 6.0 - 3.0) // within zone 35 (central 27E)
      val lat = rng.nextDouble() * 164.0 - 80.0
      val north = lat >= 0
      val (e, n) = Geodesy.utmForward(lon, lat, 35, north)
      val (lon2, lat2) = Geodesy.utmInverse(e, n, 35, north)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"round trip failed at ($lon, $lat) -> ($lon2, $lat2)")
    }
  }

  test("Web Mercator round trip") {
    (1 to 500).foreach { _ =>
      val lon = rng.nextDouble() * 358.0 - 179.0
      val lat = rng.nextDouble() * 170.0 - 85.0
      val (x, y) = Geodesy.webMercatorForward(lon, lat)
      val (lon2, lat2) = Geodesy.webMercatorInverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"round trip failed at ($lon, $lat)")
    }
  }

  test("transformPoint composes CRSs and no-ops on same EPSG") {
    assert(Geodesy.transformPoint(25.0, 60.0, 4326, 4326) == ((25.0, 60.0)))
    val (x, y) = Geodesy.transformPoint(25.0, 60.0, 4326, 3857)
    val (lon, lat) = Geodesy.transformPoint(x, y, 3857, 4326)
    assert(math.abs(lon - 25.0) < 1e-9 && math.abs(lat - 60.0) < 1e-9)
  }

  test("WKT parse + PIP: box polygon with hole") {
    val polys = Wkt.parse(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(Wkt.contains(polys, 2, 2))        // in outer
    assert(!Wkt.contains(polys, 5, 5))       // in hole
    assert(!Wkt.contains(polys, 11, 5))      // outside
    assert(Wkt.envelope(polys) == ((0.0, 0.0, 10.0, 10.0)))
  }

  test("WKT MULTIPOLYGON containment") {
    val polys = Wkt.parse("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
    assert(Wkt.contains(polys, 1, 1) && Wkt.contains(polys, 6, 6) && !Wkt.contains(polys, 3, 3))
  }
}
