package graft

import graft.sources.GbUprn
import org.apache.spark.sql.functions._

/** gb-uprn ingest vs the reference's own cluster test case
  * (ingest/gb/uprn/source_test.go:15-52): two co-located UPRNs and one
  * distant one — two clusters, sizes 2 and 1. */
class GbUprnSpec extends SparkSuite {
  import spark.implicits._

  def writeCsv(rows: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("uprn")
    java.nio.file.Files.writeString(dir.resolve("uprn.csv"),
      "UPRN,X_COORDINATE,Y_COORDINATE,LATITUDE,LONGITUDE\n" + rows)
    dir.toString
  }

  test("uprn points carry #place=uprn under the OS namespace") {
    val path = writeCsv(
      "5150460,0,0,51.5349035,-0.1257194\n5158495,0,0,51.536685,-0.127258\nbad,0,0,x,y\n")
    val w = GbUprn.features(spark, path)
    val rows = w.select(col("id.ns"), col("id.value"), col("tags").getItem("#place")).collect()
    assert(rows.length == 2, "malformed row dropped")
    rows.foreach { r =>
      assert(r.getString(0) == GbUprn.Namespace && r.getString(2) == "uprn")
    }
  }

  test("clusters: co-located UPRNs collapse to one sized point (source_test.go:15-52)") {
    val path = writeCsv(
      "5150460,0,0,51.5349035,-0.1257194\n" +
        "5150461,0,0,51.5349035,-0.1257194\n" +
        "5158495,0,0,51.536685,-0.127258\n")
    val clusters = GbUprn.clusters(spark, path)
      .select(col("tags").getItem("uprn_cluster:size"), col("lat"), col("lng"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(clusters.map(_._1).sorted.toSeq == Seq("1", "2"), clusters.mkString(";"))
    // the size-2 cluster centroid sits within a level-25 cell (~2m) of the pair
    val two = clusters.find(_._1 == "2").get
    assert(graft.core.GeoOps.haversineMeters(two._2, two._3, 51.5349035, -0.1257194) < 3.0)
  }

  test("bounding-box crop keeps only inside points (CLI --bounding-box)") {
    val path = writeCsv(
      "1,0,0,51.5349,-0.1257\n2,0,0,53.0,-2.0\n")
    val w = GbUprn.features(spark, path, crop = Some((51.0, -1.0, 52.0, 0.0)))
    assert(w.count() == 1)
    assert(w.select("id.value").as[Long].head() == 1L)
  }
}
