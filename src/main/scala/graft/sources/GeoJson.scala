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

  /** Split a FeatureCollection (or single Feature / bare geometry) into its
    * geometry JSON snippets plus flat string properties. */
  def parseFeatures(json: String): Seq[(Geometry, Map[String, String])] = {
    def propsOf(feature: String): Map[String, String] =
      "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(
        "\"properties\"\\s*:\\s*\\{([^}]*)\\}".r.findFirstMatchIn(feature)
          .map(_.group(1)).getOrElse(""))
        .map(m => m.group(1) -> m.group(2)).toMap
    def geometrySnippet(feature: String): String = {
      val i0 = feature.indexOf("\"geometry\"")
      require(i0 >= 0, "feature without geometry")
      val start = feature.indexOf('{', i0)
      var depth = 0; var i = start
      while (i < feature.length) {
        feature.charAt(i) match {
          case '{' => depth += 1
          case '}' => depth -= 1; if (depth == 0) return feature.substring(start, i + 1)
          case _ =>
        }
        i += 1
      }
      throw new IllegalArgumentException("unbalanced feature")
    }
    str(json, "type") match {
      case "FeatureCollection" =>
        // top-level feature objects inside the "features" array
        val i0 = json.indexOf("\"features\"")
        val start = json.indexOf('[', i0)
        var depth = 0; var objDepth = 0; var objStart = -1
        val feats = Seq.newBuilder[String]
        var i = start
        var done = false
        while (i < json.length && !done) {
          json.charAt(i) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) done = true
            case '{' => if (objDepth == 0) objStart = i; objDepth += 1
            case '}' => objDepth -= 1; if (objDepth == 0) feats += json.substring(objStart, i + 1)
            case _ =>
          }
          i += 1
        }
        feats.result().map(f => (parseGeometry(geometrySnippet(f)), propsOf(f)))
      case "Feature" => Seq((parseGeometry(geometrySnippet(json)), propsOf(json)))
      case _ => Seq((parseGeometry(json), Map.empty[String, String]))
    }
  }

  /** geojson-areas (api/functions/geojson.go:144-156): the valid polygons of
    * a document; rings wound the wrong way — the reference's S2 loops whose
    * area exceeds 2 pi — are inverted, i.e. exteriors normalize to CCW in
    * lon/lat. Invalid polygons are skipped. */
  def geojsonAreas(json: String): Seq[Geometry] = {
    parseFeatures(json).map(_._1).collect {
      case p: Polygon => normalizeCcw(p)
      case mp: org.locationtech.jts.geom.MultiPolygon =>
        GeoOps.factory.createMultiPolygon(
          (0 until mp.getNumGeometries)
            .map(i => normalizeCcw(mp.getGeometryN(i).asInstanceOf[Polygon])).toArray)
    }.filter(_.isValid)
  }

  /** map-geometries (api/functions/geojson.go:215-262): apply a geometry
    * transform to every geometry of a document, rebuilding the collection. */
  def mapGeometries(json: String, f: Geometry => Geometry): String = {
    val out = parseFeatures(json).map { case (g, props) =>
      featureToJson(f(g), props)
    }
    featureCollection(out)
  }

  private def normalizeCcw(p: Polygon): Polygon = {
    val shell = p.getExteriorRing.getCoordinates
    val ccw =
      if (org.locationtech.jts.algorithm.Orientation.isCCW(shell)) shell else shell.reverse
    GeoOps.factory.createPolygon(
      GeoOps.factory.createLinearRing(ccw),
      (0 until p.getNumInteriorRing).map(i =>
        GeoOps.factory.createLinearRing(p.getInteriorRingN(i).getCoordinates)).toArray)
  }

  /**
   * import-geojson(-file) (api/functions/geojson.go:104-141): a GeoJSON
   * document as world-shaped feature rows (id struct, tags from properties,
   * geometry + index columns), ready to union into a world
   * (ingest/change.go:44-110 AddFeatures). Feature ids are the document
   * positions under the given namespace.
   */
  def importGeoJson(spark: org.apache.spark.sql.SparkSession, json: String,
                    ns: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.CellExprs.install(spark)
    import spark.implicits._
    val rows = parseFeatures(json).zipWithIndex.map { case ((g, props), i) =>
      val ftype = g.getGeometryType match {
        case "Point" => "point"
        case "LineString" | "MultiLineString" => "path"
        case _ => "area"
      }
      val c = if (ftype == "point") g.getCoordinate else g.getCentroid.getCoordinate
      (ftype, ns, i.toLong, props, c.y, c.x, GeoOps.toWkb(g))
    }
    rows.toDF("ftype", "ns", "value", "tags", "lat", "lng", "geom")
      .select(struct(col("ftype"), col("ns"), col("value")).as("id"),
        col("tags"), col("lat"), col("lng"), col("geom"))
      .withColumn("cell16", graft.functions.CellExprs.cell_of(col("lat"), col("lng"), lit(16)))
      .withColumn("covering", graft.functions.CellExprs.cell_covering(col("geom"), lit(16), lit(5)))
  }

  private def numbers(s: String): Array[Double] =
    s.split(',').map(_.trim).filter(_.nonEmpty).map(_.toDouble)

  private def pairs(s: String): Seq[Coordinate] = {
    val parts = splitTop(s)
    if (parts.isEmpty) Seq(new Coordinate(numbers(s)(0), numbers(s)(1)))
    else parts.map { p => val n = numbers(p); new Coordinate(n(0), n(1)) }
  }
}
