package graft.sources

import org.locationtech.jts.geom._
import graft.core.GeoOps

/**
 * Minimal GeoJSON codec for the reference's geojson plane
 * (src/diagonal.works/b6/api/functions/geojson.go: parse-geojson, to-geojson,
 * to-geojson-collection, geojson-areas). Covers Point / LineString / Polygon /
 * MultiPolygon geometries and FeatureCollection framing — the subset b6 emits.
 */
object GeoJson {

  def geometryToJson(g: Geometry): String = g match {
    case p: Point =>
      s"""{"type":"Point","coordinates":${coord(p.getCoordinate)}}"""
    case l: LineString =>
      s"""{"type":"LineString","coordinates":[${l.getCoordinates.map(coord).mkString(",")}]}"""
    case p: Polygon =>
      s"""{"type":"Polygon","coordinates":${polyCoords(p)}}"""
    case m: MultiPolygon =>
      val polys = (0 until m.getNumGeometries)
        .map(i => polyCoords(m.getGeometryN(i).asInstanceOf[Polygon]))
      s"""{"type":"MultiPolygon","coordinates":[${polys.mkString(",")}]}"""
    case other =>
      s"""{"type":"GeometryCollection","geometries":[${
        (0 until other.getNumGeometries).map(i => geometryToJson(other.getGeometryN(i))).mkString(",")}]}"""
  }

  private def coord(c: Coordinate): String = s"[${c.x},${c.y}]"
  private def ring(r: LineString): String = s"[${r.getCoordinates.map(coord).mkString(",")}]"
  private def polyCoords(p: Polygon): String = {
    val rings = ring(p.getExteriorRing) +:
      (0 until p.getNumInteriorRing).map(i => ring(p.getInteriorRingN(i)))
    s"[${rings.mkString(",")}]"
  }

  def featureToJson(g: Geometry, props: Map[String, String]): String = {
    val ps = props.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    s"""{"type":"Feature","geometry":${geometryToJson(g)},"properties":{$ps}}"""
  }

  def featureCollection(features: Seq[String]): String =
    s"""{"type":"FeatureCollection","features":[${features.mkString(",")}]}"""

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  // ---- parse (tolerant hand parser for the emitted subset) ----

  /** Parse a GeoJSON geometry object into JTS. */
  def parseGeometry(json: String): Geometry = {
    val t = str(json, "type")
    t match {
      case "Point" =>
        val c = numbers(section(json, "coordinates"))
        GeoOps.factory.createPoint(new Coordinate(c(0), c(1)))
      case "LineString" =>
        val cs = pairs(section(json, "coordinates"))
        GeoOps.factory.createLineString(cs.toArray)
      case "Polygon" =>
        parsePolygon(section(json, "coordinates"))
      case "MultiPolygon" =>
        val body = section(json, "coordinates")
        val polys = splitTop(body).map(parsePolygon)
        GeoOps.factory.createMultiPolygon(polys.toArray)
      case other => throw new IllegalArgumentException(s"unsupported geometry: $other")
    }
  }

  private def parsePolygon(coords: String): Polygon = {
    val rings = splitTop(coords).map(r => pairs(r).toArray)
    val shell = GeoOps.factory.createLinearRing(rings.head)
    val holes = rings.tail.map(GeoOps.factory.createLinearRing)
    GeoOps.factory.createPolygon(shell, holes.toArray)
  }

  private def str(json: String, key: String): String =
    ("\"" + key + "\"\\s*:\\s*\"([^\"]+)\"").r.findFirstMatchIn(json).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(s"missing $key"))

  /** Extract the bracketed value of `key` (balanced brackets). */
  private def section(json: String, key: String): String = {
    val i0 = json.indexOf("\"" + key + "\"")
    require(i0 >= 0, s"missing $key")
    val start = json.indexOf('[', i0)
    var depth = 0; var i = start
    while (i < json.length) {
      json.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) return json.substring(start + 1, i)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced brackets")
  }

  /** Split a bracketed list "[..],[..]" at top level. */
  private def splitTop(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = -1
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '[' => if (depth == 0) start = i + 1; depth += 1
        case ']' => depth -= 1; if (depth == 0) out += body.substring(start, i)
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  private def numbers(s: String): Array[Double] =
    s.split(',').map(_.trim).filter(_.nonEmpty).map(_.toDouble)

  private def pairs(s: String): Seq[Coordinate] = {
    val parts = splitTop(s)
    if (parts.isEmpty) Seq(new Coordinate(numbers(s)(0), numbers(s)(1)))
    else parts.map { p => val n = numbers(p); new Coordinate(n(0), n(1)) }
  }
}
