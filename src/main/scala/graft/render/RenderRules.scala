package graft.render

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The reference's basemap render-rule table and zoom-gated tile pipeline
 * (src/diagonal.works/b6/renderer/renderer.go:110-233):
 *  - RenderRule {tag, min/max zoom, layer, label} -> a query per zoom
 *    (renderer.go:117-127 ToQuery);
 *  - BasemapRenderRules: the 38-entry table (renderer.go:171-209), with its
 *    9 fixed layers in enum order (renderer.go:41-55);
 *  - layer assignment = FIRST rule in table order whose tag matches,
 *    independent of zoom (renderer.go:253-263 renderFeature);
 *  - per-feature output tags: the rule's key without '#' (renderer.go:255),
 *    'name' when the rule labels (addr:housename before name,
 *    renderer.go:359-365), and the hex feature id (renderer.go:367-371).
 *
 * Spark shape: the rule table compiles to a Column predicate (zoom gate,
 * pushed to the scan) and a CASE chain (layer pick) — codegen'd, no UDFs.
 */
object RenderRules {

  /** minZoom/maxZoom of 0 mean unbounded, like the reference's yaml omitempty. */
  case class RenderRule(key: String, value: Option[String], minZoom: Int,
                        maxZoom: Int, layer: String, label: Boolean = false)

  /** Basemap layer names in enum (= wire) order, renderer.go:41-55. */
  val layerOrder: Seq[String] = Seq("boundary", "contour", "water", "road",
    "landuse", "building", "point", "label", "amenity")

  private def r(key: String, value: String, min: Int, max: Int, layer: String,
                label: Boolean = false) =
    RenderRule(key, Option(value).filter(_.nonEmpty), min, max, layer, label)

  /** BasemapRenderRules, renderer.go:171-209 — same entries, same order. */
  val basemap: Seq[RenderRule] = Seq(
    r("#building", "train_station", 8, 0, "building"),
    r("#building", "", 12, 0, "building"),
    r("#amenity", "", 12, 0, "amenity"),
    r("#highway", "cycleway", 14, 0, "road"),
    r("#highway", "footway", 14, 0, "road"),
    r("#highway", "motorway", 8, 0, "road"),
    r("#highway", "path", 14, 0, "road"),
    r("#highway", "pedestrian", 14, 0, "road"),
    r("#highway", "primary", 8, 0, "road", label = true),
    r("#highway", "residential", 12, 0, "road"),
    r("#highway", "secondary", 14, 0, "road", label = true),
    r("#highway", "service", 12, 0, "road"),
    r("#highway", "street", 12, 0, "road"),
    r("#highway", "tertiary", 12, 0, "road", label = true),
    r("#highway", "trunk", 8, 0, "road", label = true),
    r("#highway", "unclassified", 12, 0, "road"),
    r("#landuse", "cemetary", 12, 0, "landuse"),
    r("#landuse", "forest", 12, 0, "landuse"),
    r("#landuse", "grass", 12, 0, "landuse"),
    r("#landuse", "heath", 14, 0, "landuse"),
    r("#landuse", "meadow", 14, 0, "landuse"),
    r("#landuse", "park", 12, 0, "landuse"),
    r("#landuse", "pitch", 12, 0, "landuse"),
    r("#landuse", "vacant", 12, 0, "landuse"),
    r("#leisure", "park", 12, 0, "landuse"),
    r("#leisure", "pitch", 12, 0, "landuse"),
    r("#leisure", "playground", 12, 0, "landuse"),
    r("#leisure", "garden", 12, 0, "landuse"),
    r("#leisure", "nature_reserve", 12, 0, "landuse"),
    r("#natural", "coastline", 8, 0, "boundary"),
    r("#natural", "heath", 12, 0, "landuse"),
    r("#outline", "contour", 12, 0, "contour"),
    r("#railway", "rail", 8, 0, "road"),
    r("#water", "", 8, 0, "water"),
    r("#waterway", "", 8, 0, "water"),
    r("#place", "city", 0, 12, "label", label = true),
    r("#place", "town", 0, 14, "label", label = true),
  )

  /** Is the rule active at this zoom? (renderer.go:118-120) */
  def active(rule: RenderRule, zoom: Int): Boolean =
    (rule.minZoom == 0 || zoom >= rule.minZoom) &&
      (rule.maxZoom == 0 || zoom <= rule.maxZoom)

  private def ruleMatch(rule: RenderRule, tags: Column): Column = rule.value match {
    case Some(v) => tags.getItem(rule.key) === v
    case None => tags.getItem(rule.key).isNotNull
  }

  /** The zoom's rule union as a pushed-down scan predicate
    * (RenderRules.ToQuery, renderer.go:140-149). */
  def zoomPredicate(zoom: Int, tags: Column, rules: Seq[RenderRule] = basemap): Column =
    rules.filter(active(_, zoom)).map(ruleMatch(_, tags))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** First-matching-rule layer pick (renderFeature, renderer.go:253-263 —
    * the full table, NOT zoom-gated). */
  def layerColumn(tags: Column, rules: Seq[RenderRule] = basemap): Column =
    rules.foldRight(lit(null).cast("string")) { (rule, rest) =>
      when(ruleMatch(rule, tags), lit(rule.layer)).otherwise(rest)
    }

  /** The rendered tag map: rule key without '#' -> the feature's value, plus
    * 'name' for labelled rules (addr:housename wins) and the hex id. */
  def renderTagsColumn(tags: Column, idValue: Column,
                       rules: Seq[RenderRule] = basemap): Column = {
    val strippedKey = rules.foldRight(lit(null).cast("string")) { (rule, rest) =>
      when(ruleMatch(rule, tags), lit(rule.key.stripPrefix("#"))).otherwise(rest)
    }
    val strippedVal = rules.foldRight(lit(null).cast("string")) { (rule, rest) =>
      when(ruleMatch(rule, tags), coalesce(tags.getItem(rule.key), lit(""))).otherwise(rest)
    }
    val labelled = rules.foldRight(lit(false)) { (rule, rest) =>
      when(ruleMatch(rule, tags), lit(rule.label)).otherwise(rest)
    }
    val name = when(labelled,
      coalesce(tags.getItem("addr:housename"), tags.getItem("name")))
    map_filter(
      map(
        strippedKey, strippedVal,
        lit("name"), name,
        lit("id"), lower(hex(idValue))),
      (_, v) => v.isNotNull)
  }

  /**
   * The basemap tile pipeline: zoom-gate the feature table by the rule union
   * (scan-side predicate), assign layers + render tags, and MVT-encode per
   * tile with the reference's layer order. `features` needs (id struct, tags,
   * geom) like OsmWorld.features; fids are FNV-64 tile feature ids
   * (api/tiles.go:10-32).
   */
  def basemapTiles(features: DataFrame, zoom: Int): DataFrame = {
    val fid = udf((ftype: String, ns: String, value: Long) =>
      graft.functions.TileIds.tileFeatureId(
        ftype match { case "point" => 0L; case "path" => 1L; case "area" => 2L
                      case "relation" => 3L; case _ => 4L },
        ns, value))
    val in = features
      .where(zoomPredicate(zoom, col("tags")))
      .select(
        fid(col("id.ftype"), col("id.ns"), col("id.value")).as("fid"),
        layerColumn(col("tags")).as("layer"),
        col("geom"),
        renderTagsColumn(col("tags"), col("id.value")).as("rtags"),
        coalesce(try_cast(col("tags").getItem("layer"), "int"), lit(0)).as("srank"))
    Mvt.renderTiles(in, zoom, tagsCol = "rtags",
      sortRankCol = Some("srank"), layerOrder = layerOrder)
  }

  private def try_cast(c: Column, t: String): Column = c.try_cast(t)
}
