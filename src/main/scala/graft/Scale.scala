package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Fixtures
import graft.operators.SpatialJoins

/** Scaling diagnosis: times each flagship component at two parallelism levels
  * to find what limits 8->32 thread scaling in one JVM. */
object Scale {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def time(f: => Any): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }

  def rep(f: => Any): Double = (1 to 3).map(_ => time(f)).min

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N", "30000000").toLong
    val cores = sys.env.getOrElse("CORES", "4,16").split(",").map(_.trim.toInt)
    cores.foreach { c =>
      val s = session(c)
      val parts = c * 4
      def images = Fixtures.imagesMeta(s, n, parts)
      // warm
      images.agg(sum("cell16")).collect()
      SpatialJoins.pointInPolygonJoin(Fixtures.imagesMeta(s, 100000, parts), Fixtures.polygons(s)).count()
      val tRange = rep(s.range(0, n, 1, parts).agg(sum(col("id") * 3)).collect())
      val tHeavy = rep(s.range(0, n, 1, parts)
        .select(graft.functions.CellExprs.haversine_m(
          (col("id") % 1000).cast("double") * 0.001 + 51.0,
          (col("id") % 777).cast("double") * 0.001 - 0.2,
          lit(51.5), lit(-0.1)).as("d"))
        .agg(sum("d")).collect())
      val tGen = rep(images.agg(sum("cell16"), sum("lat")).collect())
      val tTile = rep(SpatialJoins.tileAssignment(images, 14)
        .groupBy("tile_xx", "tile_yy").agg(count(lit(1))).count())
      val tPip = rep(SpatialJoins.pointInPolygonJoin(images, Fixtures.polygons(s)).count())
      println(f"[scale] cores=$c range=$tRange%.2f heavy=$tHeavy%.2f gen=$tGen%.2f tile=$tTile%.2f pip=$tPip%.2f")
      s.stop()
    }
  }
}
