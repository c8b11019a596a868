package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry}
import graft.core.GeoOps
import graft.functions.CellExprs

/**
 * Sightline / visibility polygons (src/diagonal.works/b6/api/functions/
 * sightline.go:21-120: visibility from a point within a radius, occluded by
 * #building areas). Like the reference's polar sweep, rays are cast at every
 * occluder VERTEX angle (plus epsilon on each side, so both the corner and
 * the silhouette edge behind it register) in addition to `rays` uniform base
 * angles — the base angles reproduce the reference's 128-gon free-field
 * boundary (s2.RegularLoop(center, radius, 128), sightline.go:102), the
 * vertex angles make occlusion transitions exact at corners instead of
 * quantized to the ray spacing.
 *
 * Spark shape: occluders pair with origins through the covering-cell join
 * (only buildings within the radius disk are shipped to an origin's task);
 * the per-origin sweep runs in one mapGroups pass.
 */
object Sightline {

  case class SightlineRow(origin_id: Long, visible_wkb: Array[Byte], area_m2: Double)

  def sightlines(origins: DataFrame, occluders: DataFrame, radiusMeters: Double,
                 rays: Int = 256, level: Int = 13): Dataset[SightlineRow] = {
    val spark = origins.sparkSession
    import spark.implicits._
    CellExprs.install(spark)
    val metersPerDegLat = math.Pi * GeoOps.EarthRadiusMeters / 180.0
    val cellLatMeters = 180.0 / (1L << level).toDouble * metersPerDegLat
    val ring = math.ceil(radiusMeters / (cellLatMeters * 0.5)).toInt + 1

    val o = origins.select(col("origin_id"), col("lat"), col("lng"))
      .withColumn("__c", explode(CellExprs.cell_neighbor_disk(
        CellExprs.cell_of(col("lat"), col("lng"), lit(level)), lit(ring))))
    val b = occluders.select(col("geom"))
      .withColumn("__c", explode(CellExprs.cell_covering(col("geom"), lit(level), lit(32))))
      .withColumn("__c", CellExprs.cell_parent_at(col("__c"), lit(level)))
    // candidates: (origin, occluder wkb) pairs whose cells collide
    val cand = o.join(b, "__c")
      .select(col("origin_id"), col("lat"), col("lng"), col("geom"))
      .dropDuplicates("origin_id", "geom")
      .as[(Long, Double, Double, Array[Byte])]

    cand.groupByKey(_._1).mapGroups { (oid, it) =>
      val rowsSeq = it.toSeq
      val (lat, lng) = (rowsSeq.head._2, rowsSeq.head._3)
      val geoms = rowsSeq.map(r => GeoOps.fromWkb(r._4))
      val vis = visibilityPolygon(lat, lng, geoms, radiusMeters, rays)
      SightlineRow(oid, GeoOps.toWkb(vis),
        graft.functions.GeoFunctions.areaM2(vis))
    }
  }

  /** Ray-cast visibility polygon around (lat,lng): `rays` uniform angles plus
    * every occluder vertex angle ±ε (the polar-sweep event points). */
  def visibilityPolygon(lat: Double, lng: Double, occluders: Seq[Geometry],
                        radiusMeters: Double, rays: Int): Geometry = {
    val mPerDegLat = math.Pi * GeoOps.EarthRadiusMeters / 180.0
    val mPerDegLng = mPerDegLat * math.cos(math.toRadians(lat))
    val dLat = radiusMeters / mPerDegLat
    val dLng = radiusMeters / mPerDegLng
    val originC = new Coordinate(lng, lat)
    val prepared = occluders.map(GeoOps.prepare)
    val eps = 1e-7
    val vertexAngles = occluders.iterator.flatMap(_.getCoordinates.iterator).flatMap { c =>
      // normalized offsets so the angle matches the (cos a, sin a) ray space
      val ux = (c.x - lng) / dLng
      val uy = (c.y - lat) / dLat
      if (ux * ux + uy * uy <= 1.21) { // within 1.1 * radius, like the sweep boundary
        val a = math.atan2(uy, ux)
        Seq(a - eps, a, a + eps)
      } else Nil
    }.toSeq
    val base = (0 until rays).map(i => 2 * math.Pi * i / rays)
    val angles = (base ++ vertexAngles.map(a => (a % (2 * math.Pi) + 2 * math.Pi) % (2 * math.Pi)))
      .distinct.sorted
    val coords = angles.map { a =>
      val end = new Coordinate(lng + dLng * math.cos(a), lat + dLat * math.sin(a))
      val ray = GeoOps.factory.createLineString(Array(originC, end))
      var best = end
      var bestFrac = 1.0
      occluders.indices.foreach { j =>
        if (prepared(j).intersects(ray)) {
          val inter = occluders(j).intersection(ray)
          val cs = inter.getCoordinates
          cs.foreach { c =>
            val frac = math.max(
              math.abs(c.x - lng) / math.max(math.abs(end.x - lng), 1e-12),
              math.abs(c.y - lat) / math.max(math.abs(end.y - lat), 1e-12))
            if (frac < bestFrac && frac > 1e-9) { bestFrac = frac; best = c }
          }
        }
      }
      best
    }
    GeoOps.factory.createPolygon((coords :+ coords.head).toArray)
  }
}
