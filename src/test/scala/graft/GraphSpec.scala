package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Iterative frontier expansion vs an in-memory Dijkstra oracle. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  lazy val (nodes, edges) = Graph.syntheticGrid(spark, 12)
  lazy val edgeList: Seq[(Long, Long, Double)] =
    edges.as[(Long, Long, Double)].collect().toSeq

  def dijkstra(origin: Long, budget: Double): Map[Long, Double] = {
    val adj = edgeList.groupBy(_._1)
    val dist = scala.collection.mutable.Map(origin -> 0.0)
    val pq = scala.collection.mutable.PriorityQueue((0.0, origin))(
      Ordering.by[(Double, Long), Double](-_._1))
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d <= dist(u)) {
        adj.getOrElse(u, Nil).foreach { case (_, v, c) =>
          val nd = d + c
          if (nd <= budget && nd < dist.getOrElse(v, Double.MaxValue)) {
            dist(v) = nd
            pq.enqueue((nd, v))
          }
        }
      }
    }
    dist.toMap
  }

  test("reachable matches Dijkstra for every origin, distances exact") {
    val origins = Seq(0L, 77L, 143L)
    val got = Graph.reachable(edges, origins.toDF("origin"), 900.0)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (o, rows) => o -> rows.map(r => r._2 -> r._3).toMap }
    origins.foreach { o =>
      val expected = dijkstra(o, 900.0)
      val g = got(o)
      assert(g.keySet == expected.keySet,
        s"origin $o: missing=${(expected.keySet -- g.keySet).take(5)} extra=${(g.keySet -- expected.keySet).take(5)}")
      expected.foreach { case (n, d) =>
        assert(math.abs(g(n) - d) < 1e-6, s"origin $o node $n: got ${g(n)} want $d")
      }
    }
  }

  test("closest returns the argmin target with deterministic tiebreak") {
    val origins = Seq(0L).toDF("origin")
    val targets = Seq(5L, 60L, 130L).toDF("target")
    val got = Graph.closest(edges, origins, targets, 5000.0)
      .select("origin", "node", "dist_m").as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    val d = dijkstra(0L, 5000.0)
    val best = Seq(5L, 60L, 130L).flatMap(t => d.get(t).map(t -> _))
      .minBy { case (t, dd) => (dd, t) }
    assert(got(0)._2 == best._1 && math.abs(got(0)._3 - best._2) < 1e-6)
  }

  test("connectToNetwork adds access edges to the nearest node within range") {
    val (nodes, edges) = Graph.syntheticGrid(spark, 8)
    val features = Seq((1000L, 51.4601, -0.2101), (1001L, 53.0, -2.0))
      .toDF("fid", "lat", "lng") // second feature is far outside maxMeters
    val withAccess = Graph.connectToNetwork(features, nodes, edges, 500.0)
    val access = withAccess.where(col("src") === 1000L || col("dst") === 1000L).collect()
    assert(access.length == 2, "connected feature gets a bidirectional access edge")
    val far = withAccess.where(col("src") === 1001L || col("dst") === 1001L).count()
    assert(far == 0, "out-of-range feature stays disconnected")
    // reachability now flows through the new edge
    val d = Graph.reachable(withAccess, Seq(1000L).toDF("origin"), 1000.0)
    assert(d.count() > 1)
  }

  test("pathsToReach marks only edges on shortest paths") {
    val origins = Seq(0L).toDF("origin")
    val used = Graph.pathsToReach(edges, origins, 600.0)
      .as[(Long, Long, Long)].collect()
    assert(used.nonEmpty)
    val d = dijkstra(0L, 600.0)
    used.foreach { case (s, t, _) =>
      assert(d.contains(s) && d.contains(t))
      val c = edgeList.find(e => e._1 == s && e._2 == t).get._3
      assert(math.abs(d(s) + c - d(t)) < 1e-9, s"edge ($s,$t) not tight")
    }
  }
}
