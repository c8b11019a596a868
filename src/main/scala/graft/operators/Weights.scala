package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Edge-cost weight rules from the reference's routing plane
 * (src/diagonal.works/b6/graph/graph.go:20-264), as Column expressions over an
 * edge table carrying (cost_m, tags, elevation_gain_m):
 *  - walking: 4500 m/h (graph.go:20), cost in seconds = m / 1.25 m/s;
 *  - Naismith elevation penalty: +6 s per metre climbed (graph.go:161);
 *  - car: only driveable highways, speed by class (graph.go:137-145 spirit);
 *  - bus: usability rules collapse to a highway-class filter (graph.go:60-107);
 *  - `diagonal:weight` tag multiplies the cost (graph.go:22-30).
 */
object Weights {

  val WalkingMetersPerHour = 4500.0

  private def weightMultiplier(tags: Column): Column =
    coalesce(tags.getItem("diagonal:weight").cast("double"), lit(1.0))

  /** Walking time in seconds (4500 m/h). NOTE the reference's
    * WalkingTimeWeights.Weight MULTIPLIES meters by speed (graph.go:225-227)
    * rather than dividing — `walkingCostReference` reproduces that observable
    * cost for golden parity; this function returns physical seconds. */
  def walkingSeconds(costMeters: Column, tags: Column): Column =
    costMeters / lit(WalkingMetersPerHour / 3600.0) * weightMultiplier(tags)

  /** Bit-compatible reference walk cost: meters * 1.25 (graph.go:20,:225-227). */
  def walkingCostReference(costMeters: Column, tags: Column): Column =
    costMeters * lit(WalkingMetersPerHour / 3600.0) * weightMultiplier(tags)

  /** Walking + Naismith climb penalty (ElevationWeights, graph.go:161-212). */
  def elevationSeconds(costMeters: Column, tags: Column, climbMeters: Column): Column =
    walkingSeconds(costMeters, tags) + greatest(climbMeters, lit(0.0)) * lit(6.0)

  private val carSpeedsKmh: Seq[(String, Double)] = Seq(
    "motorway" -> 90.0, "trunk" -> 70.0, "primary" -> 60.0, "secondary" -> 50.0,
    "tertiary" -> 40.0, "residential" -> 30.0, "service" -> 15.0, "unclassified" -> 40.0)

  /** Car travel seconds; non-driveable highways get +Infinity (unusable). */
  def carSeconds(costMeters: Column, tags: Column): Column = {
    val cls = tags.getItem("#highway")
    val speed = carSpeedsKmh.foldLeft(lit(Double.PositiveInfinity)) {
      case (acc, (k, kmh)) => when(cls === k, lit(kmh)).otherwise(acc)
    }
    when(speed.isNull || speed === Double.PositiveInfinity, lit(Double.PositiveInfinity))
      .otherwise(costMeters / (speed * lit(1000.0 / 3600.0)) * weightMultiplier(tags))
  }

  // ---- usability predicates (the reference's tag-level rules) ----------------

  private def highway(tags: Column): Column = tags.getItem("#highway")
  private def isConnection(tags: Column): Column =
    tags.getItem("diagonal") === "connection"

  /** IsPathUsableByBus (graph.go:60-81), faithfully: diagonal=connection is
    * always usable; the highway reject-list (footway/steps/corridor/path/
    * pedestrian, cycleway/bridleway/escape, proposed/construction) is
    * unusable; access=no flips usable only when bus=yes; non-highways are
    * unusable. */
  def isPathUsableByBus(tags: Column): Column = {
    val rejected = highway(tags).isin(
      "footway", "steps", "corridor", "path", "pedestrian",
      "cycleway", "bridleway", "escape", "proposed", "construction")
    when(isConnection(tags), lit(true))
      .when(highway(tags).isNull, lit(false))
      .when(rejected, lit(false))
      .when(tags.getItem("access") === "no",
        coalesce(tags.getItem("bus") === "yes", lit(false)))
      .otherwise(lit(true))
  }

  /** IsSegmentUseableInThisDirectionByBus (graph.go:89-97): any direction
    * unless oneway=yes; oneway:bus=no overrides; else forward only. */
  def isDirectionUsableByBus(tags: Column, forward: Column): Column =
    when(coalesce(tags.getItem("oneway") === "yes", lit(false)), // null != "yes"
      coalesce(tags.getItem("oneway:bus") === "no", lit(false)) || forward)
      .otherwise(lit(true))

  /** BusWeights.IsUseable (graph.go:101-103). */
  def busUsable(tags: Column, forward: Column): Column =
    isDirectionUsableByBus(tags, forward) && isPathUsableByBus(tags)

  /** IsPathPreferredByBus (graph.go:84-87). */
  def isPathPreferredByBus(tags: Column): Column =
    highway(tags).isin("primary", "secondary", "trunk")

  /** IsPathUsableByCar (graph.go:109-127): same reject list, no access/bus
    * exception. */
  def isPathUsableByCar(tags: Column): Column = {
    val rejected = highway(tags).isin(
      "footway", "steps", "corridor", "path", "pedestrian",
      "cycleway", "bridleway", "escape", "proposed", "construction")
    when(isConnection(tags), lit(true))
      .when(highway(tags).isNull, lit(false))
      .otherwise(!rejected)
  }

  /** IsSegmentUseableInThisDirectionByCar (graph.go:129-134). */
  def isDirectionUsableByCar(tags: Column, forward: Column): Column =
    when(coalesce(tags.getItem("oneway") === "yes", lit(false)), forward)
      .otherwise(lit(true))

  /** CarWeights.IsUseable (graph.go:138-140). */
  def carUsable(tags: Column, forward: Column): Column =
    isDirectionUsableByCar(tags, forward) && isPathUsableByCar(tags)

  /** IsPathUsableByPedestrian (graph.go:144-156): everything but motorway. */
  def isPathUsableByPedestrian(tags: Column): Column =
    when(isConnection(tags), lit(true))
      .when(highway(tags).isNull, lit(false))
      .otherwise(highway(tags) =!= "motorway")

  /** BusWeights.Weight == weightFromSegment (graph.go:22-30,105-107): plain
    * meters x diagonal:weight — the reference assigns buses no speed model.
    * Usability gates the edge instead (`busUsable`). */
  def busWeight(costMeters: Column, tags: Column): Column =
    costMeters * weightMultiplier(tags)

  /** Bus travel-time convenience used by this engine's transit plane: usable
    * edges at the car class speed capped to 50 km/h (an ENGINE extension —
    * the reference's BusWeights carries no speed; kept for the GTFS peak
    * model, documented as ours). */
  def busSeconds(costMeters: Column, tags: Column): Column =
    when(isPathUsableByBus(tags),
      costMeters / lit(50.0 * 1000.0 / 3600.0) * weightMultiplier(tags))
      .otherwise(lit(Double.PositiveInfinity))
}
