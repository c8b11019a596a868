package graft

import graft.sources.GbCodePoint
import org.apache.spark.sql.functions._

/** gb-codepoint ingest: postcode id packing (b6/ids.go) and the OS
  * coordinate algorithm against the Ordnance Survey's published worked
  * example ("A guide to coordinate systems in Great Britain", Annexe C). */
class GbCodePointSpec extends SparkSuite {
  import spark.implicits._

  test("postcode ids round-trip and order like the reference packing (ids.go:16-60)") {
    Seq("SW1A1AA", "N19GU", "EC1A1BB", "M11AE").foreach { p =>
      val id = GbCodePoint.postcodeId(p)
      assert(id >= 0)
      assert(GbCodePoint.postcodeFromId(id).contains(p), s"$p round-trip")
    }
    assert(GbCodePoint.postcodeId("SW1A 1AA") == GbCodePoint.postcodeId("sw1a1aa"),
      "spaces stripped, case-insensitive")
    assert(GbCodePoint.postcodeId("X1") == -1L && GbCodePoint.postcodeId("ABCDEFGH") == -1L)
    assert(GbCodePoint.postcodeId("SW1-1AA") == -1L, "invalid chars rejected")
  }

  test("inverse Transverse Mercator matches the OS worked example to ~1e-8 deg") {
    // OS guide worked example: E 651409.903, N 313177.270 <->
    // OSGB36 lat 52d39'27.2531\"N, lon 1d43'4.5177\"E
    val (lat, lon) = GbCodePoint.osgb36FromGrid(651409.903, 313177.270)
    val wantLat = math.toRadians(52.0 + 39.0 / 60 + 27.2531 / 3600)
    val wantLon = math.toRadians(1.0 + 43.0 / 60 + 4.5177 / 3600)
    assert(math.abs(lat - wantLat) < 1e-9, s"lat ${math.toDegrees(lat)}")
    assert(math.abs(lon - wantLon) < 1e-9, s"lon ${math.toDegrees(lon)}")
  }

  test("OSGB36 -> WGS84 Helmert shifts by the expected ~100m, sane for London") {
    val (la, lo) = GbCodePoint.wgs84FromGrid(530000, 180000)
    assert(la > 51.4 && la < 51.6 && lo > -0.25 && lo < 0.0, s"($la,$lo)")
    // the datum shift in southern Britain is ~ -0.0005 deg lat, ~ +0.0015 deg lon
    val (la36, lo36) = GbCodePoint.osgb36FromGrid(530000, 180000)
    val dLat = la - math.toDegrees(la36)
    val dLon = lo - math.toDegrees(lo36)
    assert(math.abs(dLat) > 1e-4 && math.abs(dLat) < 3e-3, s"dLat $dLat")
    assert(math.abs(dLon) > 5e-4 && math.abs(dLon) < 3e-3, s"dLon $dLon")
  }

  test("features ingest: CSV rows become namespaced point features with coverings") {
    val dir = java.nio.file.Files.createTempDirectory("codepoint")
    java.nio.file.Files.writeString(dir.resolve("cp.csv"),
      "\"SW1A1AA\",529090,179645\n\"N19GU\",531000,185000\n\"BAD\",1,1\n")
    val world = GbCodePoint.features(spark, dir.toString)
    val rows = world.select(col("id.ns"), col("id.value"),
      col("tags").getItem("#place"), col("lat"), col("lng")).collect()
    assert(rows.length == 2, "short postcode dropped")
    rows.foreach { r =>
      assert(r.getString(0) == GbCodePoint.Namespace)
      assert(r.getString(2) == "postal_code")
      assert(r.getDouble(3) > 51.0 && r.getDouble(3) < 52.0)
    }
    assert(world.select("covering").head.getSeq[Long](0).nonEmpty)
  }
}
