package graft.render

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Changes
import graft.query.{Query, QueryPlanner}
import graft.shell.Shell

/**
 * Named-worlds registry + the per-tile query/collection renderers — the
 * serving surface of the reference (ingest/worlds.go:9-62,
 * renderer/query.go:14-120, renderer/collection.go:10-66,
 * renderer/handler.go), Spark-first: a "world" is a (features, refs, items)
 * DataFrame triple; a scenario world is the base with ChangeSets applied
 * non-destructively (MutableOverlayWorld semantics); rendering a whole zoom
 * level is ONE plan (explode tile cover -> per-tile cap -> encode in
 * mapGroups), and a single `/tiles/{z}/{x}/{y}.mvt` request filters that
 * plan to one tile.
 */
object Renderers {

  case class WorldId(ftype: String, ns: String, value: Long)

  /** DefaultWorldFeatureID (ingest/worlds.go:9-13). */
  val DefaultWorldId: WorldId = WorldId("collection", "diagonal.works/world", 0L)

  case class World(features: DataFrame, refs: DataFrame, items: DataFrame)

  /**
   * MutableWorlds (ingest/worlds.go:22-62): FindOrCreateWorld lazily builds
   * a mutable overlay of the base per id; `add-world-with-change`
   * (api/functions/change.go:213-218) lands a ChangeSet under its id.
   * DataFrames are immutable plans, so "mutable overlay" = replacing the
   * stored triple with the change-applied plans — the base is never touched
   * and every world stays independently queryable.
   *
   * DURABILITY: with a `root` directory the registry is backed by the
   * Snapshots layer — every applyChange exports the named world's triple as
   * committed snapshot tables (≙ export-world per world,
   * api/functions/export.go:16-29, over the compact-file format), and
   * findOrCreate in a NEW session reloads the latest committed snapshot of
   * an id it has never seen — scenario worlds survive a JVM restart.
   */
  class WorldRegistry(spark: SparkSession, base: World,
                      root: Option[String] = None) {
    private val worlds =
      scala.collection.concurrent.TrieMap[WorldId, World]()

    def findOrCreate(id: WorldId): World = {
      val key = if (valid(id)) id else DefaultWorldId
      worlds.getOrElseUpdate(key, loadPersisted(key).getOrElse(base))
    }

    /** ListWorlds RPC: the ids materialised in this registry
      * (grpc/service.go:91-100). */
    def listWorlds: Seq[WorldId] = worlds.keys.toSeq

    /** DeleteWorld RPC: drop a world from the registry
      * (grpc/service.go:102-105); a later findOrCreate re-derives it. */
    def deleteWorld(id: WorldId): Unit = worlds.remove(id)

    private def valid(id: WorldId): Boolean = id.ns.nonEmpty && id.value >= 0

    private def table(id: WorldId, part: String): String =
      s"${id.ftype}_${id.ns.replace('/', '.')}_${id.value}_$part"

    private def loadPersisted(id: WorldId): Option[World] = root.flatMap { r =>
      graft.checkpoint.Snapshots.latestFor(r, table(id, "features")).map { f =>
        def read(part: String) =
          graft.checkpoint.Snapshots.latestFor(r, table(id, part))
            .map(s => spark.read.parquet(s.dataPath))
        World(spark.read.parquet(f.dataPath),
          read("refs").getOrElse(base.refs),
          read("items").getOrElse(base.items))
      }
    }

    /** export-world for one named world: commit its triple as snapshot
      * tables under `root` (no-op without a root). */
    def exportWorld(id: WorldId): Unit = root.foreach { r =>
      val w = findOrCreate(id)
      val lineage = Seq(s"world:${id.ftype}/${id.ns}/${id.value}")
      graft.checkpoint.Snapshots.commit(w.features, r, table(id, "features"), lineage)
      graft.checkpoint.Snapshots.commit(w.refs, r, table(id, "refs"), lineage)
      graft.checkpoint.Snapshots.commit(w.items, r, table(id, "items"), lineage)
    }

    /** add-world-with-change: apply the ChangeSet to the world named `id`
      * (creating it from base if absent), store — and, when durable, commit —
      * the result. */
    def applyChange(id: WorldId, change: Changes.ChangeSet): WorldId = {
      val w = findOrCreate(id)
      val (features, refs, newItems) = Changes.apply(spark, w.features, w.refs, change)
      val items = if (newItems.isEmpty) w.items
        else w.items.unionByName(newItems, allowMissingColumns = true)
      val key = if (valid(id)) id else DefaultWorldId
      worlds(key) = World(features, refs, items)
      if (root.isDefined) exportWorld(key)
      id
    }

    def list: Seq[WorldId] =
      if (worlds.isEmpty) Seq(DefaultWorldId) else worlds.keys.toSeq

    def delete(id: WorldId): Unit = worlds.remove(id)
  }

  /** QueryRenderRules (renderer/query.go:22-34): the first matching '#' key
    * becomes a tile attribute with the '#' stripped. */
  val queryRenderKeys: Seq[String] = Seq(
    "#amenity", "#boundary", "#highway", "#landuse", "#natural", "#place",
    "#railway", "#water", "#waterway")

  /** QueryRendererMaxFeaturesPerTile (renderer/query.go:36). */
  val MaxFeaturesPerTile = 10000

  private def ftypeOrdinal: Column = expr(
    "CASE id.ftype WHEN 'point' THEN 0 WHEN 'path' THEN 1 WHEN 'area' THEN 2 " +
      "WHEN 'relation' THEN 3 WHEN 'collection' THEN 4 ELSE 5 END")

  private val tileFid = udf((o: Long, ns: String, v: Long) =>
    graft.functions.TileIds.tileFeatureId(o, ns, v))

  /** The query-rule tile attributes: first matching rule key (stripped of
    * '#') plus the feature's name label (RenderRule{Label: true} ≙
    * FillFeaturesFromFeature). */
  private def queryTags(valueCol: Option[Column]): Column = {
    val ruleTag = queryRenderKeys.foldRight(map(): Column) { (k, rest) =>
      when(col("tags").getItem(k).isNotNull,
        map(lit(k.stripPrefix("#")), col("tags").getItem(k))).otherwise(rest)
    }
    val label = when(coalesce(col("tags").getItem("name"), col("tags").getItem("@name")).isNotNull,
      map(lit("name"), coalesce(col("tags").getItem("name"), col("tags").getItem("@name"))))
      .otherwise(map())
    val v = valueCol.map(c =>
      when(c.isNotNull, map(lit("v"), c.cast("string"))).otherwise(map()))
      .getOrElse(map())
    map_concat(ruleTag, label, v)
  }

  /**
   * QueryRenderer (renderer/query.go:48-120): evaluate a shell query
   * expression over a named world, render matching features into MVT tiles
   * at `zoom` under a single "query" layer, capped at 10k features per tile
   * (deterministically by feature id, like the n-counter break at :112-114).
   * `valueExpr` is the optional per-feature function (args.V) — compiled to
   * a Column, its result lands in the `v` attribute.
   */
  def queryTiles(reg: WorldRegistry, world: WorldId, zoom: Int,
                 queryExpr: String, valueExpr: Option[String] = None): DataFrame = {
    val w = reg.findOrCreate(world).features
    val q = Shell.run(w, queryExpr) match {
      case q: Query => q
      case other => throw Shell.ShellException(s"expected a Query, found $other")
    }
    val matched = QueryPlanner.find(w, q)
    val vCol = valueExpr.map(e => Shell.featureFn(w, e))
    renderCapped(matched
      .withColumn("__fid", tileFid(ftypeOrdinal, col("id.ns"), col("id.value")))
      .withColumn("__rtags", queryTags(vCol)), zoom, "query")
  }

  /** One tile of the query layer — the `/tiles/{z}/{x}/{y}.mvt` request path
    * (renderer/handler.go): same plan, pre-filtered to the requested tile. */
  def queryTile(reg: WorldRegistry, world: WorldId, z: Int, x: Long, y: Long,
                queryExpr: String, valueExpr: Option[String] = None): Array[Byte] = {
    val rows = queryTiles(reg, world, z, queryExpr, valueExpr)
      .where(col("x") === x && col("y") === y).select("mvt").collect()
    if (rows.isEmpty) Array.emptyByteArray else rows.head.getAs[Array[Byte]](0)
  }

  /**
   * CollectionRenderer (renderer/collection.go:22-66): the features
   * referenced by a stored collection's keys and values (feature-id tokens),
   * rendered with the basemap rule tags + label. Membership resolution is a
   * JOIN against the collection items table, not a driver loop.
   */
  def collectionTiles(reg: WorldRegistry, world: WorldId,
                      collection: WorldId, zoom: Int): DataFrame = {
    val w = reg.findOrCreate(world)
    val spark = w.features.sparkSession
    import spark.implicits._
    val parseFid = udf((s: String) => Shell.parseFeatureIdToken(s))
    val items = w.items
      .where(col("ns") === collection.ns && col("value") === collection.value)
    // ids referenced by keys OR values (collection.go:37-50)
    val ids = items.select(explode(array(col("key"), col("item"))).as("tok"))
      .select(parseFid(col("tok")).as("fid")).where(col("fid").isNotNull)
      .select(col("fid._1").as("m_ftype"), col("fid._2").as("m_ns"), col("fid._3").as("m_value"))
      .distinct()
    val members = w.features.join(broadcast(ids),
      col("id.ftype") === col("m_ftype") && col("id.ns") === col("m_ns") &&
        col("id.value") === col("m_value"))
      .drop("m_ftype", "m_ns", "m_value")
    renderCapped(members
      .withColumn("__fid", tileFid(ftypeOrdinal, col("id.ns"), col("id.value")))
      .withColumn("__rtags", queryTags(None)), zoom, "collection")
  }

  /** Shared tail: explode tile cover, cap per tile by feature id, MVT-encode.
    * The cap happens BEFORE encoding and in TWO stages, so no single task
    * ever sorts an uncapped tile (the reference cap is a streaming counter,
    * renderer/query.go:112-114; a plain per-tile Window funnels the whole
    * world through one task at low zoom): stage 1 ranks (tile, salt) groups —
    * the hot tile spreads over `salts` reducers — and keeps the cap smallest
    * fids of each group, a provable superset of the tile's global top-cap;
    * stage 2 ranks the <= cap x salts survivors per tile. The salt is a
    * deterministic fid hash (stable under task retries, unlike
    * spark_partition_id). */
  private def renderCapped(features: DataFrame, zoom: Int, layer: String): DataFrame = {
    val spark = features.sparkSession
    graft.functions.CellExprs.install(spark)
    val salts = spark.sessionState.conf.numShufflePartitions
    val covered = features
      .withColumn("__tile", explode(graft.functions.CellExprs.tile_cover(col("geom"), lit(zoom))))
      .withColumn("__salt", pmod(hash(col("__fid")), lit(salts)))
    val wLocal = Window.partitionBy("__tile", "__salt").orderBy(col("__fid"))
    val pre = covered
      .withColumn("__lrank", row_number().over(wLocal))
      .where(col("__lrank") <= MaxFeaturesPerTile)
    val wTile = Window.partitionBy("__tile").orderBy(col("__fid"))
    val capped = pre
      .withColumn("__rank", row_number().over(wTile))
      .where(col("__rank") <= MaxFeaturesPerTile)
    Mvt.renderTiles(
      capped.select(col("__tile"), col("__fid").as("fid"), lit(layer).as("layer"),
        col("geom"), col("__rtags").as("tags")),
      zoom, fidCol = "fid", layerCol = "layer", geomCol = "geom", tagsCol = "tags",
      tileCol = Some("__tile"))
  }

  /**
   * `/tiles/{z}/{x}/{y}.mvt` HTTP handler (renderer/handler.go) on the JDK
   * built-in server: ?q= the shell query, ?r= the world id (optional),
   * ?v= the per-feature value expression (optional). Returns the bound port.
   */
  def serveTiles(reg: WorldRegistry, port: Int = 0): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/tiles/", { exchange =>
      try {
        val path = exchange.getRequestURI.getPath.stripPrefix("/tiles/").stripSuffix(".mvt")
        val Array(z, x, y) = path.split("/").map(_.toLong)
        val params = Option(exchange.getRequestURI.getQuery).getOrElse("").split("&")
          .filter(_.contains("=")).map { kv =>
            val Array(k, v) = kv.split("=", 2)
            k -> java.net.URLDecoder.decode(v, "UTF-8")
          }.toMap
        val world = params.get("r").flatMap(Shell.parseFeatureIdToken)
          .map { case (t, ns, v) => WorldId(t, ns, v) }.getOrElse(DefaultWorldId)
        val bytes = queryTile(reg, world, z.toInt, x, y,
          params.getOrElse("q", "[#building]"), params.get("v"))
        exchange.getResponseHeaders.add("Content-Type", "application/vnd.mapbox-vector-tile")
        if (bytes.isEmpty) exchange.sendResponseHeaders(204, -1L)
        else {
          exchange.sendResponseHeaders(200, bytes.length.toLong)
          exchange.getResponseBody.write(bytes)
        }
        exchange.close()
      } catch {
        case e: Exception =>
          val msg = e.getMessage.getBytes("UTF-8")
          exchange.sendResponseHeaders(400, msg.length.toLong)
          exchange.getResponseBody.write(msg)
          exchange.close()
      }
    })
    server.start()
    server
  }
}
