package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Fixtures
import graft.operators.SpatialJoins

/** Prints formatted physical plans for the flagship operators — the
  * plan-quality checklist (broadcast where expected, WholeStageCodegen spans,
  * pushed filters, no stray shuffles). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    println("==== pointInPolygonJoin ====")
    SpatialJoins.pointInPolygonJoin(Fixtures.points(spark, dir), Fixtures.polygons(spark))
      .explain("formatted")

    println("==== tileAssignment + agg ====")
    SpatialJoins.tileAssignment(Fixtures.points(spark, dir), 14)
      .groupBy("tile_xx", "tile_yy").agg(count(lit(1))).explain("formatted")

    println("==== tagged filter pushdown ====")
    SparkEntry.queries("qa_tagged")(spark, dir).explain("formatted")

    println("==== minhash candidate join ====")
    graft.operators.TextOps.dedupMinhashLsh(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text").explain("formatted")

    spark.stop()
  }
}
