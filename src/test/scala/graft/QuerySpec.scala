package graft

import graft.core.GeoOps
import graft.model.Fixtures
import graft.query._
import org.apache.spark.sql.functions._

class QuerySpec extends SparkSuite {

  lazy val feats = SparkEntry.features(spark, sf001)

  test("Tagged/Keyed/Typed/And/Or compile to the same rows as direct filters") {
    val tagged = QueryPlanner.find(feats, Tagged("#amenity", "cafe")).count()
    val direct = feats.where(col("tags").getItem("#amenity") === "cafe").count()
    assert(tagged == direct && tagged > 0)

    val combo = QueryPlanner.find(feats,
      And(Seq(TypedQ("point", All), Or(Seq(Tagged("#amenity", "cafe"), Keyed("@name")))))).count()
    val comboDirect = feats.where(col("id.ftype") === "point" &&
      (col("tags").getItem("#amenity") === "cafe" || col("tags").getItem("@name").isNotNull)).count()
    assert(combo == comboDirect)
  }

  test("IntersectsGeom pre-prune never drops true matches (vs brute force)") {
    import spark.implicits._
    val wkt = Fixtures.concaveWkts.head._2
    val g = GeoOps.fromWkt(wkt)
    val got = QueryPlanner.find(feats, IntersectsGeom(GeoOps.toWkb(g)))
      .select("point_id").as[Long].collect().toSet
    val expected = Fixtures.points(spark, sf001).select("point_id", "lat", "lng")
      .as[(Long, Double, Double)].collect()
      .collect { case (pid, lat, lng) if g.covers(GeoOps.point(lat, lng)) => pid }.toSet
    assert(got == expected)
  }

  test("IntersectsCells: cell membership equals bounds brute force (spatial.go:59-201)") {
    import spark.implicits._
    import graft.core.Cells
    val cells = Seq(
      Cells.cellOf(51.5353, -0.1258, 12),
      Cells.cellOf(51.47, -0.19, 10))
    val got = QueryPlanner.find(feats, IntersectsCells(cells))
      .select("point_id").as[Long].collect().toSet
    val expected = Fixtures.points(spark, sf001).select("point_id", "lat", "lng")
      .as[(Long, Double, Double)].collect()
      .collect { case (pid, la, lo) if cells.exists(c =>
        la >= Cells.latLo(c) && la < Cells.latHi(c) &&
          lo >= Cells.lngLo(c) && lo < Cells.lngHi(c)) => pid }.toSet
    assert(got == expected && got.nonEmpty)
  }

  test("entry returns rows and all queries are non-empty at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
