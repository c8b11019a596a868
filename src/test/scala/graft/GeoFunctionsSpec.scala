package graft

import graft.core.GeoOps
import graft.functions.GeoFunctions

class GeoFunctionsSpec extends SparkSuite {

  test("areaM2 matches shoelace * metric scaling for a rectangle") {
    // 0.01 x 0.01 deg rectangle at lat ~51.5
    val g = GeoFunctions.rectanglePolygon(51.50, -0.12, 51.51, -0.11)
    val mLat = GeoFunctions.EarthMetersPerDegLat * 0.01
    val mLng = GeoFunctions.EarthMetersPerDegLat * math.cos(math.toRadians(51.505)) * 0.01
    val expected = mLat * mLng
    val got = GeoFunctions.areaM2(g)
    assert(math.abs(got - expected) / expected < 0.001, s"got $got want $expected")
  }

  test("centroid uses the convex hull for concave areas (b6 rule)") {
    val concave = GeoOps.fromWkt(graft.model.Fixtures.concaveWkts.head._2)
    val (lat, lng) = GeoFunctions.centroid(concave)
    val hull = concave.convexHull().getCentroid
    assert(math.abs(lat - hull.getY) < 1e-12 && math.abs(lng - hull.getX) < 1e-12)
    // and differs from the raw centroid (the polygon is genuinely concave)
    val raw = concave.getCentroid
    assert(math.abs(raw.getY - hull.getY) > 1e-6 || math.abs(raw.getX - hull.getX) > 1e-6)
  }

  test("interpolate walks metric distance along the path") {
    val path = GeoOps.fromWkt("LINESTRING (-0.12 51.50, -0.12 51.51, -0.11 51.51)")
    val (lat0, lng0) = GeoFunctions.interpolate(path, 0.0)
    assert(lat0 == 51.50 && lng0 == -0.12)
    val (lat1, lng1) = GeoFunctions.interpolate(path, 1.0)
    assert(lat1 == 51.51 && lng1 == -0.11)
    val (latm, _) = GeoFunctions.interpolate(path, 0.3)
    assert(latm > 51.50 && latm < 51.51)
  }

  test("samplePoints spacing yields ~length/spacing points") {
    val path = GeoOps.fromWkt("LINESTRING (-0.12 51.50, -0.12 51.51)")
    val len = GeoOps.wkbLengthMeters(GeoOps.toWkb(path)) // ~1112 m
    val pts = GeoFunctions.samplePoints(path, 100.0)
    assert(math.abs(pts.length - (len / 100.0).toInt - 1) <= 1)
  }

  test("capPolygon contains its center and has ~radius extent") {
    val cap = GeoFunctions.capPolygon(51.53, -0.12, 500.0)
    assert(cap.covers(GeoOps.point(51.53, -0.12)))
    val env = cap.getEnvelopeInternal
    val latExtent = (env.getMaxY - env.getMinY) / 2 * GeoFunctions.EarthMetersPerDegLat
    assert(math.abs(latExtent - 500.0) < 5.0)
  }

  test("distanceToPointMeters projects onto the path") {
    val path = GeoOps.fromWkt("LINESTRING (-0.12 51.50, -0.12 51.52)")
    val d = GeoFunctions.distanceToPointMeters(path, 51.51, -0.10)
    val expected = GeoOps.haversineMeters(51.50, -0.12, 51.51, -0.12)
    assert(math.abs(d - expected) < 2.0, s"got $d want $expected")
  }

  test("exact-chain hull is partitioning-invariant on collinear-rich point sets") {
    // the geo_hull contract: hull(hull(A) ++ hull(B) ++ ...) == hull(all)
    // EXACTLY, for any grouping — the BigDecimal orientation predicate is
    // what makes partial-hull merging safe (JTS's double-precision hull
    // measurably violates this on ~1e-23-cross vertices; see CLAUDE.md)
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { round =>
      // lattice points (exact collinear rows/columns/diagonals) + a long
      // exact diagonal, duplicated points included
      val pts = Seq.fill(300)((51.0 + rnd.nextInt(40) * 0.1, -0.2 + rnd.nextInt(40) * 0.1)) ++
        (0 until 40).map(i => (51.0 + i * 0.1, -0.2 + i * 0.1))
      val direct = GeoOps.convexHullChain(pts)
      (2 to 5).foreach { g =>
        val parts = pts.grouped(pts.length / g + 1)
          .flatMap(p => GeoOps.convexHullChain(p)).toSeq
        val merged = GeoOps.convexHullChain(parts)
        assert(merged == direct, s"round $round groups $g: $merged != $direct")
      }
    }
  }
}
