package graft

import org.apache.spark.sql.SparkSession

/** Scratch: split camden per-query cost into plan construction (covering +
  * Catalyst) vs job execution. Not part of the build surface. */
object CamdenProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-camden-prof")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val world = graft.sources.OsmWorld.featuresDistributed(
      spark, "/root/reference/data/tests/camden.osm.pbf").cache()
    println(s"world rows=${world.count()} partitions=${world.rdd.getNumPartitions}")
    import graft.query._
    val q = And(Seq(Keyed("#building"), IntersectsCap(51.5305, -0.1232, 1000.0)))
    (1 to 5).foreach(_ => QueryPlanner.find(world, q).count())
    // (a) covering computation alone
    var t0 = System.nanoTime()
    (1 to 100).foreach { _ =>
      val capGeom = graft.functions.GeoFunctions.capPolygon(51.5305, -0.1232, 1000.0)
      graft.core.GeoOps.covering(capGeom, 16, 8)
    }
    println(f"covering: ${(System.nanoTime() - t0) / 1e9 / 100 * 1000}%.1f ms/q")
    // (b) full find() construction, no action
    t0 = System.nanoTime()
    val dfs = (1 to 100).map(_ => QueryPlanner.find(world, q))
    println(f"plan-construct: ${(System.nanoTime() - t0) / 1e9 / 100 * 1000}%.1f ms/q")
    // (c) analysis+execution on a FRESH df each time (the benchmark shape)
    t0 = System.nanoTime()
    (1 to 40).foreach(_ => QueryPlanner.find(world, q).count())
    println(f"fresh find+count: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
    // (d) count on ONE pre-built df repeatedly (execution only, plan cached)
    val df = QueryPlanner.find(world, q)
    df.count()
    t0 = System.nanoTime()
    (1 to 40).foreach(_ => df.count())
    println(f"reused-df count: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
    // (e) bare cached count (scan + task overhead only)
    t0 = System.nanoTime()
    (1 to 40).foreach(_ => world.count())
    println(f"bare count: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
    // (f) tags-only filter
    val tagsOnly = world.where(org.apache.spark.sql.functions.col("tags")
      .getItem("#building").isNotNull)
    tagsOnly.count()
    t0 = System.nanoTime()
    (1 to 40).foreach(_ => tagsOnly.count())
    println(f"tags-filter count: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
    // (g) fewer partitions: coalesced cache
    val world16 = world.coalesce(16).cache()
    world16.count()
    val df16 = QueryPlanner.find(world16, q)
    df16.count()
    t0 = System.nanoTime()
    (1 to 40).foreach(_ => df16.count())
    println(f"reused-df count @16 parts: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
    t0 = System.nanoTime()
    (1 to 40).foreach(_ => QueryPlanner.find(world16, q).count())
    println(f"fresh find+count @16 parts: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
    for (p <- Seq(8, 4, 2, 1)) {
      val wp = world.coalesce(p).cache()
      wp.count()
      (1 to 5).foreach(_ => QueryPlanner.find(wp, q).count())
      t0 = System.nanoTime()
      (1 to 40).foreach(_ => QueryPlanner.find(wp, q).count())
      println(f"fresh find+count @$p parts: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
      wp.unpersist()
    }
    // narrow cache: only the columns the serving queries touch
    val narrow = world.select("id", "tags", "lat", "lng", "cell16")
      .coalesce(4).cache()
    narrow.count()
    (1 to 5).foreach(_ => QueryPlanner.find(narrow, q).count())
    t0 = System.nanoTime()
    (1 to 40).foreach(_ => QueryPlanner.find(narrow, q).count())
    println(f"fresh find+count narrow@4: ${(System.nanoTime() - t0) / 1e9 / 40 * 1000}%.1f ms/q")
    spark.stop()
  }
}
