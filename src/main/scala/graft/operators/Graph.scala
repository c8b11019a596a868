package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Street-network reachability operators — the reference's graph plane
 * (src/diagonal.works/b6/graph/graph.go: ShortestPathSearch, Weights;
 * api/functions/graph.go: reachable, accessible-all, closest, paths-to-reach).
 *
 * Spark-first shape: the network is an edge table (src, dst, cost_m); a search
 * is an iterative frontier expansion — each round joins the frontier to the
 * edge table, takes the per-(origin,node) minimum, and stops at a fixpoint or
 * when the budget prunes everything. The loop runs on DataFrames with
 * localCheckpoint() per round to truncate lineage (the standard Pregel-on-SQL
 * pattern). Costs follow b6's walking weights: 4500 m/h
 * (graph/graph.go:20), so budget can be given in meters here and converted by
 * callers for time-based weights.
 */
object Graph {

  /** Symmetrise an edge list (b6 paths are walkable both ways unless tagged). */
  def undirected(edges: DataFrame): DataFrame =
    edges.unionByName(edges.select(
      col("dst").as("src"), col("src").as("dst"), col("cost_m")))

  /**
   * Multi-origin budget-bounded shortest-path distances:
   * returns (origin, node, dist_m) for every node with dist_m <= budget.
   * The b6 `accessible-all` semantics (api/functions/graph.go:185-245) —
   * all origins expand in ONE dataset, batched per round (no per-origin jobs).
   */
  def reachable(edges: DataFrame, origins: DataFrame, budgetMeters: Double,
                originCol: String = "origin", hopsPerRound: Int = 6): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("cost_m")).cache()
    var dist = origins.select(col(originCol).as("origin"), col(originCol).as("node"),
      lit(0.0).as("dist_m")).localCheckpoint()
    var frontier = dist
    var done = false
    while (!done) {
      // relax `hopsPerRound` hops lazily (one materialisation per round, not
      // per hop — street networks need O(budget/edgeLen) hops and per-hop
      // actions would dominate); per-hop groupBy-min keeps the frontier
      // bounded by |nodes| so chained hops cannot blow up combinatorially
      var f = frontier
      var pending = frontier.limit(0)
      (1 to hopsPerRound).foreach { _ =>
        // fresh aliases per hop: re-joining the same edge Dataset would trip
        // Spark's ambiguous-self-join detection
        val eh = e.select(col("src").as("__s"), col("dst").as("__d"), col("cost_m").as("__w"))
        f = f.join(eh, f("node") === col("__s"))
          .select(col("origin"), col("__d").as("node"),
            (col("dist_m") + col("__w")).as("dist_m"))
          .where(col("dist_m") <= budgetMeters)
          .groupBy("origin", "node").agg(min("dist_m").as("dist_m"))
        pending = pending.unionByName(f)
      }
      val newDist = dist.unionByName(pending)
        .groupBy("origin", "node").agg(min("dist_m").as("dist_m"))
        .localCheckpoint()
      // improved rows drive the next round
      val improved = newDist.join(dist.withColumnRenamed("dist_m", "old"),
          Seq("origin", "node"), "left")
        .where(col("old").isNull || col("dist_m") < col("old"))
        .select("origin", "node", "dist_m")
        .localCheckpoint()
      done = improved.isEmpty
      dist = newDist
      frontier = improved
    }
    e.unpersist()
    dist
  }

  /**
   * accessible-routes (api/functions/graph.go:312-339): shortest-path
   * distances WITH parent pointers, so routes (step lists) are recoverable.
   * Returns (origin, node, dist_m, parent); parent is null at the origin.
   */
  def reachableWithParents(edges: DataFrame, origins: DataFrame,
                           budgetMeters: Double, originCol: String = "origin",
                           hopsPerRound: Int = 6): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("cost_m")).cache()
    var dist = origins.select(col(originCol).as("origin"), col(originCol).as("node"),
      lit(0.0).as("dist_m"), lit(null).cast("long").as("parent")).localCheckpoint()
    var frontier = dist
    var done = false
    while (!done) {
      var f = frontier
      var pending = frontier.limit(0)
      (1 to hopsPerRound).foreach { _ =>
        val eh = e.select(col("src").as("__s"), col("dst").as("__d"), col("cost_m").as("__w"))
        f = f.join(eh, f("node") === col("__s"))
          .select(col("origin"), col("__d").as("node"),
            (col("dist_m") + col("__w")).as("dist_m"), f("node").as("parent"))
          .where(col("dist_m") <= budgetMeters)
          .groupBy("origin", "node")
          .agg(min_by(struct(col("dist_m"), col("parent")), struct(col("dist_m"), col("parent"))).as("best"))
          .select(col("origin"), col("node"), col("best.dist_m").as("dist_m"), col("best.parent").as("parent"))
        pending = pending.unionByName(f)
      }
      val newDist = dist.unionByName(pending)
        .groupBy("origin", "node")
        .agg(min_by(struct(col("dist_m"), col("parent")), struct(col("dist_m"), col("parent"))).as("best"))
        .select(col("origin"), col("node"), col("best.dist_m").as("dist_m"), col("best.parent").as("parent"))
        .localCheckpoint()
      val improved = newDist.join(
          dist.select(col("origin"), col("node"), col("dist_m").as("old")),
          Seq("origin", "node"), "left")
        .where(col("old").isNull || col("dist_m") < col("old"))
        .select("origin", "node", "dist_m", "parent")
        .localCheckpoint()
      done = improved.isEmpty
      dist = newDist
      frontier = improved
    }
    e.unpersist()
    dist
  }

  /** Backtrace one route from the parent-pointer table (driver-side walk over
    * the collected per-origin parents — routes are short). */
  def route(parents: Map[Long, Long], origin: Long, target: Long): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    var cur = target
    var guard = 0
    while (cur != origin && guard < 100000) {
      out += cur
      cur = parents.getOrElse(cur, origin)
      guard += 1
    }
    out += origin
    out.result().reverse
  }

  /** b6 `reachable`: nodes within budget of a single origin, joined back to a
    * feature table filtered by a predicate (api/functions/graph.go:35-85). */
  def reachableFeatures(edges: DataFrame, origin: Long, budgetMeters: Double,
                        features: DataFrame, nodeCol: String = "node_id"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val o = Seq(origin).toDF("origin")
    reachable(edges, o, budgetMeters)
      .join(features, col("node") === col(nodeCol))
  }

  /** b6 `closest` (api/functions/graph.go:402-446): nearest matching feature by
    * network distance within budget; argmin with deterministic tiebreak. */
  def closest(edges: DataFrame, origins: DataFrame, targets: DataFrame,
              budgetMeters: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = reachable(edges, origins, budgetMeters)
      .join(targets, col("node") === col("target"))
    val w = Window.partitionBy("origin").orderBy(col("dist_m"), col("node"))
    d.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** b6 `paths-to-reach` usage counts (graph.go:451-499): per-edge use count
    * over all shortest-path trees — approximated by counting, per edge, the
    * origins whose best distance uses that edge as a final relaxation. */
  def pathsToReach(edges: DataFrame, origins: DataFrame, budgetMeters: Double): DataFrame = {
    val d = reachable(edges, origins, budgetMeters)
    val e = edges.select(col("src"), col("dst"), col("cost_m"))
    val dSrc = d.select(col("origin"), col("node").as("src"), col("dist_m").as("d_src"))
    val dDst = d.select(col("origin"), col("node").as("dst"), col("dist_m").as("d_dst"))
    dSrc.join(e, "src").join(dDst, Seq("origin", "dst"))
      .where(abs(col("d_src") + col("cost_m") - col("d_dst")) < 1e-9)
      .groupBy("src", "dst").agg(countDistinct("origin").as("n_paths"))
  }

  /**
   * connect-to-network(-all) (api/functions/graph.go:547-586,
   * graph/connectivity.go): project features onto the street network by
   * adding an access edge to the nearest network node within `maxMeters`.
   * Realised as an exact kNN(k=1) cell-ring join (no cross join), then a
   * union of new edges — features too far from the network stay disconnected,
   * like the reference's threshold behavior.
   */
  def connectToNetwork(features: DataFrame, nodes: DataFrame, edges: DataFrame,
                       maxMeters: Double, level: Int = 12): DataFrame = {
    graft.functions.CellExprs.install(features.sparkSession)
    // the network-node table is the big side of the kNN; the features being
    // connected are the (small) query side
    val big = nodes.select(col("node_id").as("point_id"), col("lat"), col("lng"))
      .withColumn("cell16",
        graft.functions.CellExprs.cell_of(col("lat"), col("lng"), lit(16)))
    val small = features.select(col("fid").as("site_id"),
      col("lat").as("site_lat"), col("lng").as("site_lng"))
    val nearest = SpatialJoins.knnJoin(big, small, k = 1, level = level)
      .where(col("__dist") <= maxMeters)
    val accessEdges = nearest.select(
      col("site_id").as("src"), col("point_id").as("dst"), col("__dist").as("cost_m"))
    undirected(accessEdges).unionByName(edges.select("src", "dst", "cost_m"))
  }

  /**
   * Deterministic synthetic street grid over the fixture bbox: nodes are grid
   * intersections, edges connect 4-neighbors with haversine costs; some edges
   * removed pseudo-randomly (seeded) so shortest paths are non-trivial.
   */
  def syntheticGrid(spark: SparkSession, n: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val lat0 = 51.46; val lng0 = -0.21
    val dLat = 0.002; val dLng = 0.003
    def nodeId(i: Int, j: Int): Long = i.toLong * n + j
    val nodes = (for { i <- 0 until n; j <- 0 until n } yield
      (nodeId(i, j), lat0 + i * dLat, lng0 + j * dLng)).toDF("node_id", "lat", "lng")
    val edges = (for {
      i <- 0 until n; j <- 0 until n
      (di, dj) <- Seq((0, 1), (1, 0))
      if i + di < n && j + dj < n
      // drop ~20% of edges deterministically
      if graft.model.Fixtures.splitmix64(nodeId(i, j) * 4 + di * 2 + dj) % 5 != 0
    } yield {
      val c = graft.core.GeoOps.haversineMeters(
        lat0 + i * dLat, lng0 + j * dLng, lat0 + (i + di) * dLat, lng0 + (j + dj) * dLng)
      (nodeId(i, j), nodeId(i + di, j + dj), c)
    }).toDF("src", "dst", "cost_m")
    (nodes, undirected(edges))
  }
}
