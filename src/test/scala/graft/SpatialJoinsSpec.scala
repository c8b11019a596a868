package graft

import graft.core.GeoOps
import graft.model.Fixtures
import graft.operators.SpatialJoins
import org.apache.spark.sql.functions._

/** Spatial joins vs brute-force JTS / haversine oracles — the analogue of the
  * reference's covering/intersection golden tests (b6/spatial_test.go:1-60,
  * ingest/spatial_test.go). */
class SpatialJoinsSpec extends SparkSuite {

  lazy val pts: Seq[(Long, Double, Double)] = {
    import spark.implicits._
    Fixtures.points(spark, sf001).select("point_id", "lat", "lng")
      .as[(Long, Double, Double)].collect().toSeq
  }

  test("pointInPolygonJoin matches brute-force JTS covers (incl. concave + multipolygon)") {
    val polys = Fixtures.polygons(spark, includeConcave = true)
    val got = SpatialJoins.pointInPolygonJoin(Fixtures.points(spark, sf001), polys)
      .select("point_id", "poly_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val polyGeoms = Fixtures.convexPolygons.map { case (id, _, ring) =>
      val closed = ring :+ ring.head
      (id, GeoOps.fromWkt(closed.map { case (x, y) => s"$x $y" }
        .mkString("POLYGON ((", ", ", "))")))
    } ++ Fixtures.concaveWkts.map { case (id, w) => (id, GeoOps.fromWkt(w)) }
    val expected = (for {
      (pid, lat, lng) <- pts
      (polyId, g) <- polyGeoms
      if g.covers(GeoOps.point(lat, lng))
    } yield (pid, polyId)).toSet

    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("knnJoin is exact vs brute-force haversine top-k") {
    val got = SpatialJoins.knnJoin(Fixtures.points(spark, sf001), Fixtures.sites(spark), 3)
      .select("site_id", "rank", "point_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val expected = Fixtures.knnSites.flatMap { case (sid, slat, slng) =>
      pts.map { case (pid, lat, lng) =>
        (pid, GeoOps.haversineMeters(lat, lng, slat, slng))
      }.sortBy { case (pid, d) => (d, pid) }.take(3).zipWithIndex
        .map { case ((pid, _), i) => (sid, i + 1, pid) }
    }.toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("knnJoin ring loop scans the probe side once per ring (localCheckpoint, no recompute)") {
    import spark.implicits._
    // sparse far-apart points force >= 3 ring doublings before the k-th
    // neighbor guarantee holds; an accumulator counts probe-row evaluations
    val acc = spark.sparkContext.longAccumulator("probe-scans")
    val sparse = (0 until 400).map { i =>
      (i.toLong, 51.0 + (i % 20) * 0.04, -1.0 + (i / 20) * 0.04)
    }
    val counted = udf { (pid: Long) => acc.add(1); true }
    val points = sparse.toDF("point_id", "lat", "lng")
      .withColumn("cell16", graft.functions.CellExprs.cell_of(col("lat"), col("lng"), lit(16)))
      .where(counted(col("point_id")))
    val sites = Seq((1L, 51.4, -0.6), (2L, 51.02, -0.98)).toDF("site_id", "site_lat", "site_lng")
    // level 14: ~1.2 km cells vs ~4.4 km point spacing -> the k=3 guarantee
    // needs ring >= ~8, i.e. >= 4 doublings
    val got = SpatialJoins.knnJoin(points, sites, 3, level = 14)
      .select("site_id", "rank", "point_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expected = Seq((1L, 51.4, -0.6), (2L, 51.02, -0.98)).flatMap { case (sid, slat, slng) =>
      sparse.map { case (pid, lat, lng) =>
        (pid, GeoOps.haversineMeters(lat, lng, slat, slng))
      }.sortBy { case (pid, d) => (d, pid) }.take(3).zipWithIndex
        .map { case ((pid, _), i) => (sid, i + 1, pid) }
    }.toSet
    assert(got == expected)
    // each ring evaluates every probe row once for its annulus join; rings
    // double 1,2,4,... <= 1024 -> at most 11 scans. WITHOUT the checkpoint the
    // r-th ring re-ran rings 1..r-1 too (quadratic: 60+ scans of 400 rows).
    val scans = acc.value / 400
    assert(scans <= 14, s"probe side scanned $scans times — ring lineage is re-executing")
  }

  test("withinCap matches brute force") {
    val got = SpatialJoins.withinCap(Fixtures.points(spark, sf001), 51.5353, -0.1258, 1500.0)
      .select("point_id").collect().map(_.getLong(0)).toSet
    val expected = pts.collect {
      case (pid, lat, lng) if GeoOps.haversineMeters(lat, lng, 51.5353, -0.1258) < 1500.0 => pid
    }.toSet
    assert(got == expected)
  }

  test("tileAssignment matches scalar tile math") {
    val got = SpatialJoins.tileAssignment(Fixtures.points(spark, sf001), 14)
      .select("point_id", "tile_xx", "tile_yy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = pts.map { case (pid, lat, lng) =>
      (pid, GeoOps.tileX(lng, 14), GeoOps.tileY(lat, 14))
    }.toSet
    assert(got == expected)
  }

  test("tileCoverJoin covers every polygon's sampled interior points' tiles") {
    val covered = SpatialJoins.tileCoverJoin(Fixtures.polygons(spark), 14)
      .select("poly_id", "tile").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Fixtures.convexPolygons.foreach { case (id, _, ring) =>
      val cx = ring.map(_._1).sum / ring.size
      val cy = ring.map(_._2).sum / ring.size
      val tid = GeoOps.tileId(14, GeoOps.tileX(cx, 14), GeoOps.tileY(cy, 14))
      assert(covered.contains((id, tid)), s"poly $id centroid tile missing")
    }
  }

  test("intersectionJoin finds overlapping polygons exactly") {
    val polys = Fixtures.polygons(spark, includeConcave = true)
    val a = polys.select(col("poly_id").as("id_a"), col("geom").as("ga"))
    val b = polys.select(col("poly_id").as("id_b"), col("geom").as("gb"))
    val got = SpatialJoins.intersectionJoin(a, b, "ga", "gb", level = 10)
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val geoms = (Fixtures.convexPolygons.map { case (id, _, ring) =>
      val closed = ring :+ ring.head
      (id, GeoOps.fromWkt(closed.map { case (x, y) => s"$x $y" }.mkString("POLYGON ((", ", ", "))")))
    } ++ Fixtures.concaveWkts.map { case (id, w) => (id, GeoOps.fromWkt(w)) })
    val expected = (for {
      (ia, ga) <- geoms; (ib, gb) <- geoms
      if ia < ib && ga.intersects(gb)
    } yield (ia, ib)).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }
}
