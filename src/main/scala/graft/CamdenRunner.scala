package graft

import org.apache.spark.sql.SparkSession

/**
 * One clean-JVM measurement of the reference's own search benchmark
 * (BenchmarkSearchWorld, ingest/compact/world_test.go:241-254):
 * Keyed(#building) AND IntersectsCap(51.5305,-0.1232,1km) over camden.
 * Forked per rep by Bench — the same fresh-JVM isolation protocol as the
 * scaling pairs, because the long-lived inventory JVM's accumulated
 * session/GC state (and this VM's noisy-CPU windows) taxed the in-JVM
 * reading for two consecutive rounds while standalone reruns were 3-5x
 * faster. args: cores; prints "RESULT rows qps".
 */
object CamdenRunner {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-camden")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // distributed ingest (row-identical to the driver parse, see
    // DistributedOsmSpec); the reference benchmark also pre-builds its index
    val world = graft.sources.OsmWorld.featuresDistributed(
      spark, "/root/reference/data/tests/camden.osm.pbf").cache()
    world.count()
    import graft.query._
    val q = And(Seq(Keyed("#building"), IntersectsCap(51.5305, -0.1232, 1000.0)))
    var n = 0L
    (1 to 5).foreach(_ => n = QueryPlanner.find(world, q).count()) // JIT + codegen warm
    val runs = 20
    val sec = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      (1 to runs).foreach(_ => n = QueryPlanner.find(world, q).count())
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"RESULT $n ${runs / sec}%.3f")
    spark.stop()
  }
}
