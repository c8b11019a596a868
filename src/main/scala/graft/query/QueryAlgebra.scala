package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CellExprs
import graft.operators.SpatialJoins

/**
 * The reference's query algebra (src/diagonal.works/b6/search.go + spatial.go)
 * as a sealed ADT compiled to Catalyst `Column` predicates over a features
 * table with columns:
 *   id struct(ftype string, ns string, value long), tags map<string,string>,
 *   lat double, lng double, cell16 long [, geom binary, covering array<long>]
 *
 * Tag-key conventions match b6 (b6/search.go:107-114): '#' keys are indexed
 * key=value, '@' keys by key only — here both live in the `tags` map and the
 * distinction shows up in which predicates the planner will push to the scan
 * (map-key filters prune row groups once hot keys are promoted to columns).
 *
 * Non-spatial queries compile to pure predicates (Catalyst pushes them down);
 * spatial queries compile to covering-join plans via `find`.
 */
sealed trait Query {
  /** Exact post-filter, the analogue of b6's Query.Matches. */
  def toColumn: Column
}

case object All extends Query { def toColumn: Column = lit(true) }
case object Empty extends Query { def toColumn: Column = lit(false) }

case class Tagged(key: String, value: String) extends Query {
  def toColumn: Column = col("tags").getItem(key) === value
}
case class Keyed(key: String) extends Query {
  def toColumn: Column = col("tags").getItem(key).isNotNull
}
case class TypedQ(ftype: String, q: Query) extends Query {
  def toColumn: Column = col("id.ftype") === ftype && q.toColumn
}
case class And(qs: Seq[Query]) extends Query {
  def toColumn: Column = qs.map(_.toColumn).reduce(_ && _)
}
case class Or(qs: Seq[Query]) extends Query {
  def toColumn: Column = qs.map(_.toColumn).reduce(_ || _)
}
case object IsValid extends Query {
  def toColumn: Column = col("id.value") >= 0 && col("id.ns") =!= ""
}
case class KeyRange(lo: Long, hi: Long) extends Query {
  def toColumn: Column = col("id.value") >= lo && col("id.value") < hi
}
case class TokenPrefix(key: String, prefix: String) extends Query {
  def toColumn: Column = col("tags").getItem(key).startsWith(prefix)
}
case class IntersectsCap(lat: Double, lng: Double, radiusMeters: Double) extends Query {
  def toColumn: Column =
    CellExprs.haversine_m(col("lat"), col("lng"), lit(lat), lit(lng)) < lit(radiusMeters)
}
/** Point-in-polygon against a literal WKB geometry (IntersectsPoint inverted:
  * features whose location falls inside the geometry). */
case class IntersectsGeom(wkb: Array[Byte]) extends Query {
  def toColumn: Column = CellExprs.wkb_covers_point(lit(wkb), col("lat"), col("lng"))
}
/** IntersectsCells (b6/spatial.go:59-201): features inside any of the given
  * cells. Exact for point features: containment in a cell == the point's
  * ancestor at the cell's level IS that cell (no geometry test needed). */
case class IntersectsCells(cells: Seq[Long]) extends Query {
  def toColumn: Column = cells.map { c =>
    CellExprs.cell_parent_at(col("cell16"), lit(graft.core.Cells.level(c))) === c
  }.reduce(_ || _)
}
/** Features whose GEOMETRY intersects a literal polyline — the exact-JTS form
  * of IntersectsPolyline (b6/spatial.go:509-607; the reference approximates
  * area intersection by vertex containment, TODO'd at :562 — we refine
  * exactly, a strict superset of its approximation). Needs a `geom` column. */
case class IntersectsPolyline(wkb: Array[Byte]) extends Query {
  def toColumn: Column = CellExprs.wkb_intersects(col("geom"), lit(wkb))
}
/** Features whose geometry intersects a literal (multi)polygon —
  * IntersectsMultiPolygon (b6/spatial.go:609-711). Needs a `geom` column. */
case class IntersectsPolygon(wkb: Array[Byte]) extends Query {
  def toColumn: Column = CellExprs.wkb_intersects(col("geom"), lit(wkb))
}
/** IntersectsFeature (b6/spatial.go:373-418): look up the geometry of the
  * given feature id in the world and delegate to the right Intersects* node
  * by geometry type. Resolution happens in QueryPlanner.find. */
case class IntersectsFeature(ftype: String, ns: String, value: Long) extends Query {
  def toColumn: Column =
    throw new IllegalStateException("IntersectsFeature must be planned via QueryPlanner.find (needs the world)")
}

object QueryPlanner {
  /**
   * b6 `find`: features matching the query. Non-spatial predicates are plain
   * pushdown filters; IntersectsGeom additionally pre-prunes by the covering
   * cells of the geometry before the exact test (the s2:/a2: token rewrite of
   * search/spatial.go:65-83, realised as an ancestor-cell semi-filter).
   */
  /** Ancestor-cell pre-prune as scalar comparisons: the ancestor of `cell16`
    * at level l can only match cover cells OF level l, so the old
    * arrays_overlap over a per-row built ancestor ARRAY (one GenericArrayData
    * allocation per row on the serving path) rewrites to an allocation-free
    * OR of per-level `isin` tests — same rows, pure codegen scalars. */
  private def coverPrune(cover: Array[Long]): Column =
    cover.groupBy(c => graft.core.Cells.level(c)).toSeq.sortBy(_._1).map {
      case (l, cs) =>
        CellExprs.cell_parent_at(col("cell16"), lit(l)).isin(cs.toSeq: _*)
    }.reduce(_ || _)

  def find(features: DataFrame, q: Query): DataFrame = q match {
    case IntersectsGeom(wkb) =>
      val cover = graft.core.GeoOps.coveringWkb(wkb, 16, 8)
      features
        .where(coverPrune(cover))
        .where(q.toColumn)
    case cap @ IntersectsCap(lat, lng, r) =>
      // cap -> 128-gon covering -> ancestor-cell pre-prune (the s2:/a2: token
      // rewrite of search/spatial.go:65-83), exact haversine refine
      val capGeom = graft.functions.GeoFunctions.capPolygon(lat, lng, r)
      val cover = graft.core.GeoOps.covering(capGeom, 16, 8)
      features
        .where(coverPrune(cover))
        .where(cap.toColumn)
    case q @ IntersectsPolyline(wkb) => geomIntersectsPlan(features, wkb, q.toColumn)
    case q @ IntersectsPolygon(wkb) => geomIntersectsPlan(features, wkb, q.toColumn)
    case IntersectsFeature(ftype, ns, value) =>
      // look up the target's geometry once (broadcast-by-literal), then
      // delegate by geometry type like b6/spatial.go:373-418
      val row = features
        .where(col("id.ftype") === ftype && col("id.ns") === ns && col("id.value") === value)
        .select("geom").head
      val wkb = row.getAs[Array[Byte]](0)
      val g = graft.core.GeoOps.fromWkb(wkb)
      val delegate = g.getGeometryType match {
        case "LineString" | "MultiLineString" => IntersectsPolyline(wkb)
        case "Point" => IntersectsCap(g.getCoordinate.y, g.getCoordinate.x, 0.5)
        case _ =>
          if (features.columns.contains("geom")) IntersectsPolygon(wkb) else IntersectsGeom(wkb)
      }
      find(features, delegate)
    case And(qs) if qs.exists(isSpatial) =>
      val (spatial, rest) = qs.partition(isSpatial)
      val base = if (rest.isEmpty) features else features.where(And(rest).toColumn)
      spatial.foldLeft(base) { (df, s) => find(df, s) }
    case other => features.where(other.toColumn)
  }

  private def isSpatial(q: Query): Boolean = q match {
    case _: IntersectsGeom | _: IntersectsCap | _: IntersectsPolyline |
         _: IntersectsPolygon | _: IntersectsFeature => true
    case _ => false
  }

  /** Covering pre-prune + exact JTS refine for geometry-intersection queries:
    * the s2:/a2: duality (search/spatial.go:65-113) — a feature is a candidate
    * when its covering overlaps the query covering's ancestor closure, or its
    * covering's ancestor closure overlaps the query covering. */
  private def geomIntersectsPlan(features: DataFrame, wkb: Array[Byte], refine: Column): DataFrame = {
    val coverQ = graft.core.GeoOps.coveringWkb(wkb, 16, 8)
    val ancQ = (coverQ ++ coverQ.flatMap(graft.core.Cells.ancestors)).distinct.sorted
    val pruned =
      if (features.columns.contains("covering")) {
        val featAnc = flatten(transform(col("covering"),
          c => array_union(array(c), CellExprs.cell_ancestors(c))))
        features.where(
          arrays_overlap(col("covering"), typedLit(ancQ.toSeq)) ||
            arrays_overlap(featAnc, typedLit(coverQ.toSeq)))
      } else {
        val levels = coverQ.map(c => graft.core.Cells.level(c)).distinct.sorted
        val anc = array(levels.map(l => CellExprs.cell_parent_at(col("cell16"), lit(l))): _*)
        features.where(arrays_overlap(anc, typedLit(coverQ.toSeq)))
      }
    pruned.where(refine)
  }
}
