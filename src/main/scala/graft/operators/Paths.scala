package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.GeoOps
import graft.functions.GeoFunctions

/**
 * Path/vertex-plane operators from the reference's registry
 * (src/diagonal.works/b6/api/functions/features.go):
 *  - points (features.go:226-357): geometry -> vertex collection;
 *  - sample-points(-along-paths) (features.go:410-462): equidistant points,
 *    deduplicated across paths;
 *  - degree (features.go:212-219) lives in Graph;
 *  - join / ordered-join (features.go:465-519): concatenate two paths;
 *  - apply-to-point/path/area (geojson.go:159-213): geometry-type gating;
 *  - collect-areas (geometry.go:22-37): union-all of polygons (no dissolve).
 */
object Paths {

  /** explode a WKB geometry column into (vertex_idx, vlat, vlng) rows. */
  def points(df: DataFrame, geomCol: String = "geom"): DataFrame = {
    val verts = udf((wkb: Array[Byte]) =>
      GeoOps.fromWkb(wkb).getCoordinates.map(c => (c.y, c.x)).toSeq)
    df.select(col("*"), posexplode(verts(col(geomCol))).as(Seq("vertex_idx", "__v")))
      .withColumn("vlat", col("__v._1"))
      .withColumn("vlng", col("__v._2"))
      .drop("__v")
  }

  /** sample-points-along-paths: equidistant samples every `spacing` meters,
    * deduplicated across paths (the reference dedups identical points). */
  def samplePointsAlongPaths(df: DataFrame, spacingMeters: Double,
                             geomCol: String = "geom"): DataFrame = {
    val sample = udf((wkb: Array[Byte]) =>
      GeoFunctions.samplePoints(GeoOps.fromWkb(wkb), spacingMeters)
        .map { case (la, lo) => (la, lo) })
    df.withColumn("__s", explode(sample(col(geomCol))))
      .select(col("__s._1").as("slat"), col("__s._2").as("slng"))
      .dropDuplicates("slat", "slng")
  }

  /** ordered-join: concatenate the vertex arrays of two paths (reversing the
    * second when endpoints require it — features.go:465-519). */
  def joinPaths(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ca = GeoOps.fromWkb(a).getCoordinates
    val cb = GeoOps.fromWkb(b).getCoordinates
    val (fa, fb) =
      if (ca.last.equals2D(cb.head)) (ca, cb)
      else if (ca.last.equals2D(cb.last)) (ca, cb.reverse)
      else if (ca.head.equals2D(cb.head)) (ca.reverse, cb)
      else if (ca.head.equals2D(cb.last)) (ca.reverse, cb.reverse)
      else (ca, cb)
    val tail = if (fa.last.equals2D(fb.head)) fb.drop(1) else fb
    GeoOps.toWkb(GeoOps.factory.createLineString(fa ++ tail))
  }

  val join_paths = udf((a: Array[Byte], b: Array[Byte]) => joinPaths(a, b))

  /** apply-to-point/path/area: gate a transform by geometry type. */
  def applyByType(df: DataFrame, typeCol: String,
                  onPoint: Column => Column, onPath: Column => Column,
                  onArea: Column => Column, target: Column): Column =
    when(col(typeCol) === "point", onPoint(target))
      .when(col(typeCol) === "path", onPath(target))
      .otherwise(onArea(target))

  /** collect-areas: union-all polygons into one multi-geometry (no dissolve). */
  def collectAreas(df: DataFrame, geomCol: String = "geom"): Array[Byte] = {
    val wkbs = df.select(col(geomCol)).collect().map(_.getAs[Array[Byte]](0))
    val gc = GeoOps.factory.createGeometryCollection(wkbs.map(GeoOps.fromWkb))
    GeoOps.toWkb(gc)
  }
}
