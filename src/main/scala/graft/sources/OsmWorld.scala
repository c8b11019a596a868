package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, Polygon}
import graft.core.GeoOps
import graft.functions.CellExprs

/**
 * OSM -> feature-table ingest with the reference's observable semantics
 * (src/diagonal.works/b6/ingest/osm.go):
 *  - tag mapping: the listed OSM keys become '#'-indexed (searchable) keys,
 *    fhrs:id/wikidata/wikipedia become '@'-indexed (osm.go:136-156);
 *  - every node -> a point feature; open ways -> path features; closed ways
 *    (first ref == last ref) become area features INSTEAD of path features
 *    (osm.go:349-360; validated by the golden counts: 117 paths, 5 highway
 *    areas — do not emit both without re-deriving those goldens);
 *  - relations tagged type=multipolygon -> area features assembled from their
 *    member ways (osm.go:218-222, :315);
 *  - namespaces openstreetmap.org/node|way|relation (ingest/osm.go:14-32).
 *
 * The extract is parsed on the driver (golden fixtures are small); at scale
 * the PBF blob framing parallelizes naturally (one blob per task).
 */
object OsmWorld {

  val osmTagMapping: Map[String, String] = Map(
    "amenity" -> "#amenity", "barrier" -> "#barrier", "boundary" -> "#boundary",
    "bridge" -> "#bridge", "building" -> "#building", "highway" -> "#highway",
    "landuse" -> "#landuse", "leisure" -> "#leisure", "natural" -> "#natural",
    "network" -> "#network", "place" -> "#place", "railway" -> "#railway",
    "route" -> "#route", "shop" -> "#shop", "tourism" -> "#tourism",
    "water" -> "#water", "waterway" -> "#waterway",
    "fhrs:id" -> "@fhrs:id", "wikidata" -> "@wikidata", "wikipedia" -> "@wikipedia")

  def mapTags(tags: Map[String, String]): Map[String, String] =
    tags.map { case (k, v) => osmTagMapping.getOrElse(k, k) -> v }

  case class FeatureRow(ftype: String, ns: String, value: Long,
                        tags: Map[String, String], lat: Double, lng: Double,
                        geom: Array[Byte])

  def features(spark: SparkSession, pbfPath: String): DataFrame = {
    CellExprs.install(spark)
    val osm = OsmPbf.read(pbfPath)
    val nodeById = osm.nodes.map(n => n.id -> n).toMap
    val wayById = osm.ways.map(w => w.id -> w).toMap

    val rows = Vector.newBuilder[FeatureRow]

    osm.nodes.foreach { n =>
      rows += FeatureRow("point", "openstreetmap.org/node", n.id, mapTags(n.tags),
        n.lat, n.lon, GeoOps.toWkb(GeoOps.point(n.lat, n.lon)))
    }

    def wayCoords(refs: Array[Long]): Array[Coordinate] =
      refs.flatMap(nodeById.get).map(n => new Coordinate(n.lon, n.lat))

    osm.ways.foreach { w =>
      val coords = wayCoords(w.refs)
      // ways referencing nodes outside the extract are invalid and dropped
      // (the reference deletes invalid features at world build,
      // ingest/basic.go:441)
      if (coords.length == w.refs.length && coords.length >= 2) {
        // closed ways surface as AREA features, open ways as PATH features —
        // matches the reference's observable type counts (117 paths + 4 way
        // areas + 1 multipolygon area for #highway in granary-square)
        if (w.refs.head == w.refs.last && coords.length >= 4) {
          try {
            val poly = GeoOps.factory.createPolygon(coords)
            val cc = poly.getCentroid
            rows += FeatureRow("area", "openstreetmap.org/way", w.id, mapTags(w.tags),
              cc.getY, cc.getX, GeoOps.toWkb(poly))
          } catch { case _: Throwable => }
        } else {
          val line = GeoOps.factory.createLineString(coords)
          val c = line.getCentroid
          rows += FeatureRow("path", "openstreetmap.org/way", w.id, mapTags(w.tags),
            c.getY, c.getX, GeoOps.toWkb(line))
        }
      }
    }

    osm.relations.foreach { r =>
      if (r.tags.get("type").contains("multipolygon")) {
        assembleMultiPolygon(r, wayById, nodeById).foreach { mp =>
          val c = mp.getCentroid
          rows += FeatureRow("area", "openstreetmap.org/relation", r.id,
            mapTags(r.tags), c.getY, c.getX, GeoOps.toWkb(mp))
        }
      } else {
        // relation feature: keep tags + a representative location (first member)
        val loc = r.members.headOption.flatMap(m => nodeById.get(m.ref))
        rows += FeatureRow("relation", "openstreetmap.org/relation", r.id,
          mapTags(r.tags), loc.map(_.lat).getOrElse(0.0), loc.map(_.lon).getOrElse(0.0),
          GeoOps.toWkb(GeoOps.point(loc.map(_.lat).getOrElse(0.0), loc.map(_.lon).getOrElse(0.0))))
      }
    }

    import spark.implicits._
    val df = rows.result().toDF()
    df.select(
        struct(col("ftype"), col("ns"), col("value")).as("id"),
        col("tags"), col("lat"), col("lng"), col("geom"))
      .withColumn("cell16", CellExprs.cell_of(col("lat"), col("lng"), lit(16)))
      .withColumn("covering", CellExprs.cell_covering(col("geom"), lit(16), lit(5)))
  }

  /**
   * Distributed ingest: the driver scans only the PBF blob framing; blocks
   * decode in executor tasks (OsmPbf.readSpark ≙ reference osm/pbf.go:123-160
   * block-parallel decode) and way/relation assembly happens as JOINS against
   * the node table — no whole-file driver parse, so extract size is bounded by
   * cluster memory, not driver memory. Produces rows identical to
   * `features()` (asserted by DistributedOsmSpec).
   */
  def featuresDistributed(spark: SparkSession, pbfPath: String): DataFrame = {
    CellExprs.install(spark)
    import spark.implicits._
    val raw = OsmPbf.readSpark(spark, pbfPath).cache()
    val nodes = raw.filter(_.kind == 0).toDF().select(col("id"), col("lat"), col("lon"), col("tags"))
    val ways = raw.filter(_.kind == 1).toDF().select(col("id"), col("refs"), col("tags"))
    val rels = raw.filter(_.kind == 2).toDF().select(col("id"), col("members"), col("tags"))

    val pointRows = nodes.as[(Long, Double, Double, Map[String, String])].map {
      case (id, lat, lon, tags) =>
        FeatureRow("point", "openstreetmap.org/node", id, mapTags(tags),
          lat, lon, GeoOps.toWkb(GeoOps.point(lat, lon)))
    }

    // resolve way vertices: explode refs (dups preserved via pos), equi-join
    // the node table, regroup in ref order — the scale path for assembly
    val nodeCoords = nodes.select(col("id").as("ref"), col("lat").as("nlat"), col("lon").as("nlng"))
    val coordsByWay = ways.select(col("id").as("way_id"), posexplode(col("refs")).as(Seq("pos", "ref")))
      .join(nodeCoords, Seq("ref"))
      .groupBy("way_id")
      .agg(collect_list(struct(col("pos"), col("nlat"), col("nlng"))).as("coords"))

    val wayRows = ways.join(coordsByWay, ways("id") === coordsByWay("way_id"), "left")
      .select(col("id"), col("refs"), col("tags"), col("coords"))
      .as[(Long, Seq[Long], Map[String, String], Seq[(Int, Double, Double)])]
      .flatMap { case (id, refs, tags, coords0) =>
        val coords = Option(coords0).getOrElse(Seq.empty)
          .sortBy(_._1).map(c => new Coordinate(c._3, c._2)).toArray
        if (coords.length == refs.length && coords.length >= 2) {
          if (refs.head == refs.last && coords.length >= 4) {
            try {
              val poly = GeoOps.factory.createPolygon(coords)
              val cc = poly.getCentroid
              Some(FeatureRow("area", "openstreetmap.org/way", id, mapTags(tags),
                cc.getY, cc.getX, GeoOps.toWkb(poly)))
            } catch { case _: Throwable => None }
          } else {
            val line = GeoOps.factory.createLineString(coords)
            val c = line.getCentroid
            Some(FeatureRow("path", "openstreetmap.org/way", id, mapTags(tags),
              c.getY, c.getX, GeoOps.toWkb(line)))
          }
        } else None
      }

    // multipolygon relations: member ways join their resolved coords, then a
    // per-relation polygonize (inner join drops member ways outside the
    // extract, like the driver path's wayById.get)
    val mpRels = rels.where(col("tags").getItem("type") === "multipolygon")
    val mpRows = mpRels
      .select(col("id").as("rel_id"), posexplode(col("members")).as(Seq("mpos", "m")))
      .where(col("m.mtype") === 1 && col("m.role").isin("outer", "", "inner"))
      .join(coordsByWay, col("m.ref") === col("way_id"))
      .groupBy(col("rel_id"))
      .agg(collect_list(struct(col("mpos"), col("m.role").as("role"), col("coords"))).as("ms"))
      .join(mpRels.select(col("id").as("rel_id"), col("tags")), "rel_id")
      .as[(Long, Seq[(Int, String, Seq[(Int, Double, Double)])], Map[String, String])]
      .flatMap { case (id, ms, tags) =>
        def linesFor(roles: Set[String]): Seq[Geometry] =
          ms.sortBy(_._1).filter(m => roles.contains(m._2)).flatMap { m =>
            val cs = m._3.sortBy(_._1).map(c => new Coordinate(c._3, c._2)).toArray
            if (cs.length >= 2) Some(GeoOps.factory.createLineString(cs): Geometry) else None
          }
        val outers = polygonize(linesFor(Set("outer", "")))
        if (outers.isEmpty) None
        else {
          val inners = polygonize(linesFor(Set("inner")))
          val shell = outers.reduce(_ union _)
          val mp = inners.foldLeft(shell)((acc, h) => acc.difference(h))
          val c = mp.getCentroid
          Some(FeatureRow("area", "openstreetmap.org/relation", id, mapTags(tags),
            c.getY, c.getX, GeoOps.toWkb(mp)))
        }
      }

    // other relations: representative location = first member's node (if any)
    val otherRows = rels.where(coalesce(col("tags").getItem("type"), lit("")) =!= "multipolygon")
      .select(col("id"), col("tags"),
        when(size(col("members")) > 0, col("members")(0).getField("ref")).as("fref"))
      .join(nodeCoords.withColumnRenamed("ref", "fref"), Seq("fref"), "left")
      .select(col("id"), col("tags"), col("nlat"), col("nlng"))
      .as[(Long, Map[String, String], Option[Double], Option[Double])]
      .map { case (id, tags, la, lo) =>
        FeatureRow("relation", "openstreetmap.org/relation", id, mapTags(tags),
          la.getOrElse(0.0), lo.getOrElse(0.0),
          GeoOps.toWkb(GeoOps.point(la.getOrElse(0.0), lo.getOrElse(0.0))))
      }

    val df = pointRows.unionByName(wayRows).unionByName(mpRows).unionByName(otherRows).toDF()
    df.select(
        struct(col("ftype"), col("ns"), col("value")).as("id"),
        col("tags"), col("lat"), col("lng"), col("geom"))
      .withColumn("cell16", CellExprs.cell_of(col("lat"), col("lng"), lit(16)))
      .withColumn("covering", CellExprs.cell_covering(col("geom"), lit(16), lit(5)))
      // the union of the four feature planes stacks their partition counts
      // (pbf blocks + three shuffle widths — 64 for camden's 253k rows);
      // one ingest-time exchange right-sizes the SERVING layout so every
      // later query over the cached world pays data-proportional task
      // dispatches. SCALE-ADAPTIVE (guide §2.2/§6): derived from the source
      // pbf size (~0.75 MB of compressed pbf per partition, i.e. a few
      // hundred k features), clamped to [1, defaultParallelism] — a
      // city-extract world serves from a handful of partitions (measured
      // 143 -> 87 ms/query on the camden benchmark vs partitions pinned at
      // core count), while a planet-scale pbf still fans out to every core.
      .repartition(servingPartitions(spark, pbfPath))
  }

  /** Partition count for the assembled feature table: source-size-derived,
    * clamped to the session's parallelism. */
  private def servingPartitions(spark: SparkSession, pbfPath: String): Int = {
    val bytes = try {
      val p = new org.apache.hadoop.fs.Path(pbfPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p).getLen
    } catch { case _: Throwable => Long.MaxValue / 2 } // unknown: keep full parallelism
    val target = 768L * 1024
    math.max(1, math.min(spark.sparkContext.defaultParallelism.toLong,
      (bytes + target - 1) / target).toInt)
  }

  /**
   * Reference table — every (from feature) -> (to feature) structural
   * reference in the extract: path -> vertex node (pos = vertex index) and
   * relation -> member (pos = member index, with role). This is the queryable
   * surface behind the reference's reverse-reference lookups
   * (b6/world.go:1313-1319 FindRelationsByFeature / FindReferences and
   * api/functions/features.go:362-406 point-paths / point-features) — in
   * Spark those become plain equi-joins against this table.
   */
  def references(spark: SparkSession, pbfPath: String): DataFrame = {
    import spark.implicits._
    val raw = OsmPbf.readSpark(spark, pbfPath)
    val wayRefs = raw.filter(_.kind == 1).toDF()
      .select(lit("path").as("from_type"), col("id").as("from_id"),
        posexplode(col("refs")).as(Seq("pos", "to_id")))
      .select(col("from_type"), col("from_id"), lit("point").as("to_type"),
        col("to_id"), lit("").as("role"), col("pos"))
    val relRefs = raw.filter(_.kind == 2).toDF()
      .select(lit("relation").as("from_type"), col("id").as("from_id"),
        posexplode(col("members")).as(Seq("pos", "m")))
      .select(col("from_type"), col("from_id"),
        expr("CASE m.mtype WHEN 0 THEN 'point' WHEN 1 THEN 'path' ELSE 'relation' END").as("to_type"),
        col("m.ref").as("to_id"), col("m.role").as("role"), col("pos"))
    wayRefs.unionByName(relRefs)
  }

  /**
   * Walking-network edge table from the extract's #highway ways: one
   * undirected edge per consecutive vertex pair, cost = haversine meters —
   * the b6 Traverse/segment graph (b6/world.go:1104-1216) materialised as a
   * Spark edge table. Ways with nodes outside the extract are dropped (same
   * validity rule as feature ingest).
   */
  def networkEdges(spark: SparkSession, pbfPath: String): DataFrame = {
    val osm = OsmPbf.read(pbfPath)
    val nodeById = osm.nodes.map(n => n.id -> n).toMap
    // closed ways are AREA features, not paths — the reference's graph
    // traverses path segments only (a pedestrian square's closed perimeter is
    // not a walkable chain)
    val openWays = osm.ways.filter(w =>
      w.refs.length >= 2 && w.refs.head != w.refs.last && w.refs.forall(nodeById.contains))
    // graph vertices follow the reference's segment rule
    // (ingest/basic.go:254-262): path endpoints, points referenced by more
    // than one path, or points carrying their own tags
    val refCount = scala.collection.mutable.Map.empty[Long, Int]
    openWays.foreach(w => w.refs.foreach(r => refCount(r) = refCount.getOrElse(r, 0) + 1))
    def isVertex(w: OsmPbf.Way, i: Int): Boolean = {
      val r = w.refs(i)
      i == 0 || i == w.refs.length - 1 || refCount.getOrElse(r, 0) > 1 ||
        nodeById(r).tags.nonEmpty
    }
    val edges = Vector.newBuilder[(Long, Long, Double)]
    openWays.foreach { w =>
      if (w.tags.contains("highway")) { // walk usability: any #highway path
        var segStart = 0
        var acc = 0.0
        var i = 1
        while (i < w.refs.length) {
          val a = nodeById(w.refs(i - 1)); val b = nodeById(w.refs(i))
          acc += GeoOps.haversineMeters(a.lat, a.lon, b.lat, b.lon)
          if (isVertex(w, i)) {
            edges += ((w.refs(segStart), w.refs(i), acc))
            segStart = i
            acc = 0.0
          }
          i += 1
        }
      }
    }
    import spark.implicits._
    graft.operators.Graph.undirected(edges.result().toDF("src", "dst", "cost_m"))
  }

  /**
   * Area entrances: (area id, boundary node id) pairs — the reference reaches
   * areas through the network when the search visits a point their boundary
   * references (FindAreasByPoint; graph/graph.go:452-461).
   */
  def areaEntrances(spark: SparkSession, pbfPath: String): DataFrame = {
    val osm = OsmPbf.read(pbfPath)
    val rows = for {
      w <- osm.ways
      if w.refs.length >= 4 && w.refs.head == w.refs.last
      ref <- w.refs.distinct
    } yield (w.id, ref)
    import spark.implicits._
    rows.toDF("area_id", "node_id")
  }

  /** Assemble a multipolygon relation: polygonize outer member ways, subtract
    * polygonized inner rings (best-effort ring joining via JTS). */
  def assembleMultiPolygon(r: OsmPbf.Relation,
                           wayById: Map[Long, OsmPbf.Way],
                           nodeById: Map[Long, OsmPbf.Node]): Option[Geometry] = {
    def linesFor(roles: Set[String]): Seq[Geometry] =
      r.members.toSeq
        .filter(m => m.mtype == 1 && roles.contains(m.role))
        .flatMap(m => wayById.get(m.ref)) // members may lie outside the extract
        .flatMap { w =>
          val coords = w.refs.flatMap(nodeById.get).map(n => new Coordinate(n.lon, n.lat))
          if (coords.length >= 2) Some(GeoOps.factory.createLineString(coords): Geometry) else None
        }
    val outers = polygonize(linesFor(Set("outer", "")))
    if (outers.isEmpty) return None
    val inners = polygonize(linesFor(Set("inner")))
    val shell = outers.reduce(_ union _)
    val result = inners.foldLeft(shell)((acc, h) => acc.difference(h))
    Some(result)
  }

  private def polygonize(lines: Seq[Geometry]): Seq[Geometry] = {
    if (lines.isEmpty) return Nil
    val p = new org.locationtech.jts.operation.polygonize.Polygonizer()
    lines.foreach(p.add)
    import scala.jdk.CollectionConverters._
    p.getPolygons.asScala.toSeq.collect { case poly: Polygon => poly: Geometry }
  }
}
