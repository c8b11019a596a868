package graft
import org.apache.spark.sql.SparkSession
object MmBench {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("mm")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("mm_decode")(s, d).write.format("noop").mode("overwrite").save()
      println(f"mm_decode rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // camden workload
    val world = graft.sources.OsmWorld.features(s, "/root/reference/data/tests/camden.osm.pbf").cache()
    println("camden features: " + world.count())
    import graft.query._
    val q = And(Seq(Keyed("#building"), IntersectsCap(51.5305, -0.1232, 1000.0)))
    var n = 0L
    QueryPlanner.find(world, q).count()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => n = QueryPlanner.find(world, q).count())
      val sec = (System.nanoTime()-t0)/1e9
      println(f"camden rep$rep: ${20/sec}%.2f qps (rows=$n)")
    }
    s.stop()
  }
}
