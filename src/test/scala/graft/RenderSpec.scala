package graft

import graft.core.GeoOps
import graft.model.Fixtures
import graft.operators.Elevation
import graft.render.Mvt
import org.apache.spark.sql.functions._

class RenderSpec extends SparkSuite {
  import spark.implicits._

  test("MVT geometry commands: zigzag deltas and command ids per spec") {
    // a point at a known position inside tile (14, tx, ty)
    val z = 14
    val tx = GeoOps.tileX(-0.1258, z); val ty = GeoOps.tileY(51.5353, z)
    val (gtype, cmds) = Mvt.geometryCommands(GeoOps.point(51.5353, -0.1258), z, tx, ty)
    assert(gtype == 1)
    assert(cmds.length == 3)
    assert(cmds(0) == ((1 << 3) | 1)) // MoveTo, count 1
    // params decode back to in-tile coords
    def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    val px = unzig(cmds(1)); val py = unzig(cmds(2))
    assert(px >= 0 && px <= Mvt.Extent && py >= 0 && py <= Mvt.Extent, s"($px,$py)")
  }

  test("MVT polygon commands close each ring") {
    val z = 14
    val poly = GeoOps.fromWkt("POLYGON ((-0.13 51.53, -0.12 51.53, -0.12 51.54, -0.13 51.54, -0.13 51.53))")
    val tx = GeoOps.tileX(-0.125, z); val ty = GeoOps.tileY(51.535, z)
    val (gtype, cmds) = Mvt.geometryCommands(poly, z, tx, ty)
    assert(gtype == 3)
    assert(cmds.last == ((1 << 3) | 7).toLong) // ClosePath
    assert(cmds.head == ((1 << 3) | 1).toLong) // MoveTo
  }

  test("MVT polygon winding is normalized regardless of stored orientation") {
    // MVT 2.1: exterior rings must have positive surveyor's-formula area in
    // y-down tile coords (≙ reference renderer/encoder.go:90-93 relying on S2
    // canonical orientation). Encode the same square stored CW and CCW — both
    // must decode to the same, positive-area exterior.
    val z = 14
    val ccw = GeoOps.fromWkt("POLYGON ((-0.13 51.53, -0.12 51.53, -0.12 51.54, -0.13 51.54, -0.13 51.53))")
    val cw = GeoOps.fromWkt("POLYGON ((-0.13 51.53, -0.13 51.54, -0.12 51.54, -0.12 51.53, -0.13 51.53))")
    val tx = GeoOps.tileX(-0.125, z); val ty = GeoOps.tileY(51.535, z)
    def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    def ringArea2(cmds: Seq[Long]): Long = {
      // decode MoveTo(1) + LineTo(n-1) + ClosePath into ring vertices
      assert(cmds.head == ((1 << 3) | 1))
      var i = 1; var cx = 0L; var cy = 0L
      val pts = Seq.newBuilder[(Long, Long)]
      cx += unzig(cmds(i)); cy += unzig(cmds(i + 1)); i += 2
      pts += ((cx, cy))
      val lineTo = cmds(i); i += 1
      val n = (lineTo >>> 3).toInt
      (0 until n).foreach { _ =>
        cx += unzig(cmds(i)); cy += unzig(cmds(i + 1)); i += 2
        pts += ((cx, cy))
      }
      val ring = pts.result()
      ring.indices.map { j =>
        val (x1, y1) = ring(j); val (x2, y2) = ring((j + 1) % ring.length)
        x1 * y2 - x2 * y1
      }.sum
    }
    val a1 = ringArea2(Mvt.geometryCommands(ccw, z, tx, ty)._2)
    val a2 = ringArea2(Mvt.geometryCommands(cw, z, tx, ty)._2)
    assert(a1 == a2, s"windings differ: $a1 vs $a2")
    assert(a1 > 0, s"exterior ring must have positive y-down area, got $a1")
  }

  test("renderTiles produces decodable per-tile binaries with layers sorted") {
    val feats = Fixtures.polygons(spark)
      .select(col("poly_id").as("fid"), col("tag").as("layer"), col("geom"),
        map(lit("name"), concat(lit("poly-"), col("poly_id"))).as("tags"))
    val tiles = Mvt.renderTiles(feats, 14).collect()
    assert(tiles.nonEmpty)
    tiles.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("mvt")
      assert(bytes.nonEmpty)
      // sanity: wire-parse the top level — every field must be a layer (3)
      var pos = 0
      while (pos < bytes.length) {
        var shift = 0; var key = 0L
        var b = 0
        do { b = bytes(pos); pos += 1; key |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
        assert((key >>> 3) == 3 && (key & 7) == 2, s"unexpected field ${key >>> 3}")
        shift = 0; var len = 0L
        do { b = bytes(pos); pos += 1; len |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
        pos += len.toInt
      }
    }
    // every polygon lands in at least one tile
    val feat0 = Mvt.renderTiles(feats, 12).count()
    assert(feat0 >= 1)
  }

  test("elevation IDW matches brute force") {
    val spots = Seq(
      (51.530, -0.130, 10.0), (51.535, -0.125, 20.0),
      (51.540, -0.120, 30.0), (51.520, -0.140, 40.0),
    ).toDF("slat", "slng", "elevation")
    val queries = Seq((1L, 51.533, -0.127), (2L, 51.521, -0.139)).toDF("qid", "lat", "lng")
    val got = Elevation.elevationAt(queries, spots, 2000.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val spotSeq = Seq((51.530, -0.130, 10.0), (51.535, -0.125, 20.0),
      (51.540, -0.120, 30.0), (51.520, -0.140, 40.0))
    def idw(lat: Double, lng: Double): Double = {
      val in = spotSeq.map { case (sla, sln, e) =>
        (GeoOps.haversineMeters(lat, lng, sla, sln), e)
      }.filter(_._1 < 2000.0)
      val ws = in.map { case (d, e) => (1.0 / math.max(d, 0.001), e) }
      ws.map { case (w, e) => w * e }.sum / ws.map(_._1).sum
    }
    assert(math.abs(got(1L) - idw(51.533, -0.127)) < 1e-9)
    assert(math.abs(got(2L) - idw(51.521, -0.139)) < 1e-9)
  }
}
