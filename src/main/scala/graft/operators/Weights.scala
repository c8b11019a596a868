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

  private val busUsable = Seq("motorway", "trunk", "primary", "secondary",
    "tertiary", "unclassified", "residential", "busway", "service")

  /** Bus usability (BusWeights, graph.go:60-107): usable classes at car speed
    * capped to 50 km/h, otherwise unusable. */
  def busSeconds(costMeters: Column, tags: Column): Column = {
    val cls = tags.getItem("#highway")
    when(cls.isin(busUsable: _*),
      costMeters / lit(50.0 * 1000.0 / 3600.0) * weightMultiplier(tags))
      .otherwise(lit(Double.PositiveInfinity))
  }
}
