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

  test("knnJoinDistributed matches the driver-mode loop exactly on the fixture") {
    val driver = SpatialJoins.knnJoin(Fixtures.points(spark, sf001), Fixtures.sites(spark), 3)
      .select("site_id", "rank", "point_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val dist = SpatialJoins.knnJoinDistributed(
        Fixtures.points(spark, sf001), Fixtures.sites(spark), 3)
      .select("site_id", "rank", "point_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(dist == driver, s"missing=${(driver -- dist).take(5)} extra=${(dist -- driver).take(5)}")
  }

  test("knnJoin auto-selects the distributed active set at 1e5 sites (no driver-resident rows)") {
    import graft.functions.CellExprs._
    // 100k sites on a lattice inside a 10k-point grid: the active-site set
    // would be ~100k Rows on the driver heap in the old mode; the distributed
    // loop keeps it a checkpointed DataFrame and the only driver values are
    // per-ring counts. k=1 at level 15 settles nearly everything ring 1.
    val nSide = 100 // points: 100x100 at 0.005 deg
    val pts0 = spark.range(nSide.toLong * nSide)
      .withColumn("point_id", col("id"))
      .withColumn("lat", lit(50.0) + (col("id") % nSide).cast("double") * lit(0.005))
      .withColumn("lng", lit(0.0) + floor(col("id") / nSide).cast("double") * lit(0.005))
      .withColumn("cell16", cell_of(col("lat"), col("lng"), lit(16)))
      .drop("id")
    val sSide = 317 // sites: 317*317 > 1e5, trimmed to exactly 1e5
    val sites0 = spark.range(100000L)
      .withColumn("site_id", col("id"))
      .withColumn("site_lat", lit(50.005) + (col("id") % sSide).cast("double") * lit(0.0015))
      .withColumn("site_lng", lit(0.005) + floor(col("id") / sSide).cast("double") * lit(0.0015))
      .drop("id")
    val got = SpatialJoins.knnJoin(pts0, sites0, k = 1, level = 15)
    // every site settles with exactly one row
    assert(got.count() == 100000L)
    // sampled exactness vs brute-force haversine over all 10k points
    val sampleIds = Seq(0L, 316L, 12345L, 50000L, 77777L, 99999L)
    val gotSample = got.where(col("site_id").isin(sampleIds: _*))
      .select("site_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val allPts = (0 until nSide * nSide).map { i =>
      (i.toLong, 50.0 + (i % nSide) * 0.005, 0.0 + (i / nSide) * 0.005)
    }
    sampleIds.foreach { sid =>
      val slat = 50.005 + (sid % sSide) * 0.0015
      val slng = 0.005 + (sid / sSide) * 0.0015
      val best = allPts.map { case (pid, la, ln) =>
        (pid, GeoOps.haversineMeters(la, ln, slat, slng))
      }.minBy { case (pid, d) => (d, pid) }._1
      assert(gotSample(sid) == best, s"site $sid: got ${gotSample(sid)} expected $best")
    }
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
