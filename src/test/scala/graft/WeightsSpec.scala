package graft

import graft.operators.{Graph, Weights}
import graft.functions.CellExprs
import org.apache.spark.sql.functions._

class WeightsSpec extends SparkSuite {
  import spark.implicits._

  val edges = Seq(
    (1L, 2L, 125.0, Map("#highway" -> "residential")),
    (2L, 3L, 250.0, Map("#highway" -> "footway")),
    (3L, 4L, 100.0, Map("#highway" -> "motorway")),
    (4L, 5L, 100.0, Map("#highway" -> "residential", "diagonal:weight" -> "2.0")),
  ).toDF("src", "dst", "cost_m", "tags")

  test("walking weights: 4500 m/h = 1.25 m/s, diagonal:weight multiplies") {
    val got = edges.withColumn("sec", Weights.walkingSeconds(col("cost_m"), col("tags")))
      .select("src", "sec").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 100.0) < 1e-9) // 125m at 1.25 m/s
    assert(math.abs(got(4L) - 160.0) < 1e-9) // 100m * 2.0 weight
  }

  test("car weights: driveable classes get finite cost, footways are unusable") {
    val got = edges.withColumn("sec", Weights.carSeconds(col("cost_m"), col("tags")))
      .select("src", "sec").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L).isPosInfinity)
    assert(got(3L) < got(1L)) // motorway faster than residential for same-ish length
  }

  test("elevation weights add Naismith 6 s/m climbed") {
    val df = Seq((125.0, Map.empty[String, String], 10.0)).toDF("cost_m", "tags", "climb")
    val sec = df.select(Weights.elevationSeconds(col("cost_m"), col("tags"), col("climb")))
      .head().getDouble(0)
    assert(math.abs(sec - (100.0 + 60.0)) < 1e-9)
  }

  test("reachable with time weights: budget in seconds behaves like meters/speed") {
    val e = edges.withColumn("cost_m", Weights.walkingSeconds(col("cost_m"), col("tags")))
      .select("src", "dst", "cost_m")
    val d = Graph.reachable(Graph.undirected(e), Seq(1L).toDF("origin"), 301.0)
      .select("node").as[Long].collect().toSet
    assert(d == Set(1L, 2L, 3L)) // 1->2 =100s, 2->3 =200s, 3->4 would exceed
  }

  test("bus/car/pedestrian usability: table-driven vs the reference rule outcomes (graph.go:60-156)") {
    // each row: (tags, forward, busUsable, carUsable, pedestrianUsable) with
    // the expected values hand-derived from the Go rules
    val cases = Seq(
      (Map("#highway" -> "residential"), true, true, true, true),
      (Map("#highway" -> "footway"), true, false, false, true),
      (Map("#highway" -> "steps"), true, false, false, true),
      (Map("#highway" -> "corridor"), true, false, false, true),
      (Map("#highway" -> "path"), true, false, false, true),
      (Map("#highway" -> "pedestrian"), true, false, false, true),
      (Map("#highway" -> "cycleway"), true, false, false, true),
      (Map("#highway" -> "bridleway"), true, false, false, true),
      (Map("#highway" -> "escape"), true, false, false, true),
      (Map("#highway" -> "proposed"), true, false, false, true),
      (Map("#highway" -> "construction"), true, false, false, true),
      (Map("#highway" -> "motorway"), true, true, true, false), // peds reject motorway only
      (Map("#highway" -> "primary", "access" -> "no"), true, false, true, true),
      (Map("#highway" -> "primary", "access" -> "no", "bus" -> "yes"), true, true, true, true),
      (Map("diagonal" -> "connection"), true, true, true, true), // connections always usable
      (Map.empty[String, String], true, false, false, false), // non-highway
      // direction: oneway=yes kills the reverse direction...
      (Map("#highway" -> "primary", "oneway" -> "yes"), false, false, false, true),
      (Map("#highway" -> "primary", "oneway" -> "yes"), true, true, true, true),
      // ...unless oneway:bus=no reopens it for buses only
      (Map("#highway" -> "primary", "oneway" -> "yes", "oneway:bus" -> "no"), false, true, false, true),
    )
    val df = cases.zipWithIndex
      .map { case ((tags, fwd, b, c, p), i) => (i, tags, fwd, b, c, p) }
      .toDF("i", "tags", "forward", "exp_bus", "exp_car", "exp_ped")
    val got = df.select(col("i"),
      Weights.busUsable(col("tags"), col("forward")).as("bus"),
      Weights.carUsable(col("tags"), col("forward")).as("car"),
      Weights.isPathUsableByPedestrian(col("tags")).as("ped"),
      col("exp_bus"), col("exp_car"), col("exp_ped")).collect()
    got.foreach { r =>
      assert(r.getAs[Boolean]("bus") == r.getAs[Boolean]("exp_bus"),
        s"bus mismatch on case ${r.getAs[Int]("i")}")
      assert(r.getAs[Boolean]("car") == r.getAs[Boolean]("exp_car"),
        s"car mismatch on case ${r.getAs[Int]("i")}")
      assert(r.getAs[Boolean]("ped") == r.getAs[Boolean]("exp_ped"),
        s"ped mismatch on case ${r.getAs[Int]("i")}")
    }
    // preference + weight model: primary/secondary/trunk preferred; bus
    // weight is meters x diagonal:weight (no invented speed)
    val pref = Seq(Map("#highway" -> "primary"), Map("#highway" -> "residential"))
      .map(t => Tuple1(t)).toDF("tags")
      .select(Weights.isPathPreferredByBus(col("tags"))).as[Boolean].collect()
    assert(pref.toSeq == Seq(true, false))
    val w = Seq((100.0, Map("diagonal:weight" -> "2.0")), (100.0, Map.empty[String, String]))
      .toDF("m", "tags").select(Weights.busWeight(col("m"), col("tags"))).as[Double].collect()
    assert(w.toSeq == Seq(200.0, 100.0))
  }

  test("cell_center round-trips into the owning cell") {
    CellExprs.install(spark)
    val df = Seq((51.5353, -0.1258)).toDF("lat", "lng")
      .withColumn("c", CellExprs.cell_of(col("lat"), col("lng"), lit(14)))
      .withColumn("clat", CellExprs.cell_center_lat(col("c")))
      .withColumn("clng", CellExprs.cell_center_lng(col("c")))
      .withColumn("c2", CellExprs.cell_of(col("clat"), col("clng"), lit(14)))
    val r = df.head()
    assert(r.getAs[Long]("c") == r.getAs[Long]("c2"))
  }
}
