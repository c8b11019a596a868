package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * GTFS feed -> transit network ingest with the reference's observable
 * semantics (src/diagonal.works/b6/ingest/transit/gtfs.go CSV reading,
 * ingest/gtfs/gtfs.go connection building):
 *  - stops/routes/trips/stop_times read as header CSVs; trips with unknown
 *    routes and stop_times with unknown trips/stops are skipped
 *    (transit/gtfs.go:215-222, :267-271);
 *  - times sanitize hours mod 24 (gtfs.go:32-45); arrival < departure wraps
 *    midnight (+1 day, gtfs.go:66-75);
 *  - a trip's consecutive stop pairs classify PEAK when departure or
 *    (unwrapped) arrival lies in [08:00,10:00] or [16:00,18:00] inclusive
 *    (gtfs.go:21-30, :84);
 *  - per directed stop pair: mean travel seconds per class, rounded UP to the
 *    minute (gtfs.go:200-215) — the gtfs:peak / gtfs:off-peak tags;
 *  - transit edges are DIRECTED (TransitTimeWeights.IsUseable respects
 *    direction, graph/graph.go:239-245).
 *
 * Spark shape: CSV scans, one window per trip for consecutive pairs, one
 * aggregation per stop pair — all shuffle keys are trip/stop ids.
 */
object Gtfs {

  private def csv(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.option("header", "true").csv(s"$dir/$name")

  /** "HH:MM:SS" -> seconds of day, hours mod 24 (gtfs.go sanitizeTime). */
  private def secondsOfDay(c: org.apache.spark.sql.Column) =
    (split(c, ":").getItem(0).cast("int") % 24) * 3600 +
      split(c, ":").getItem(1).cast("int") * 60 +
      split(c, ":").getItem(2).cast("int")

  private def inPeak(s: org.apache.spark.sql.Column) =
    (s >= 8 * 3600 && s <= 10 * 3600) || (s >= 16 * 3600 && s <= 18 * 3600)

  /** Stop table with stable long node ids (xxhash64 of the stop id). */
  def stops(spark: SparkSession, dir: String): DataFrame =
    csv(spark, dir, "stops.txt")
      .select(col("stop_id"), col("stop_name"),
        col("stop_lat").cast("double").as("lat"),
        col("stop_lon").cast("double").as("lng"))
      .where(col("lat").isNotNull && col("lng").isNotNull)
      .withColumn("node_id", xxhash64(col("stop_id")))

  /**
   * Directed stop-pair connections: (from_stop, to_stop, peak_s, offpeak_s),
   * each the per-class mean travel time rounded up to the minute; null when
   * the class was never observed (then the reference's Weight falls back to
   * the base weights — graph/graph.go:247-264).
   */
  def connections(spark: SparkSession, dir: String): DataFrame = {
    val validTrips = csv(spark, dir, "trips.txt").select("trip_id", "route_id")
      .join(csv(spark, dir, "routes.txt").select("route_id"), "route_id")
      .select("trip_id")
    val knownStops = stops(spark, dir).select(col("stop_id"))
    val st = csv(spark, dir, "stop_times.txt")
      .select(col("trip_id"), col("arrival_time"), col("departure_time"),
        col("stop_id"), col("stop_sequence").cast("int").as("seq"))
      .join(validTrips, "trip_id")
      .join(knownStops, "stop_id")
    val w = Window.partitionBy("trip_id").orderBy("seq")
    val pairs = st
      .withColumn("from_stop", lag(col("stop_id"), 1).over(w))
      .withColumn("dep_s", lag(secondsOfDay(col("departure_time")), 1).over(w))
      .where(col("from_stop").isNotNull)
      .withColumn("arr_s", secondsOfDay(col("arrival_time")))
      // midnight wrap: classification uses unwrapped times (a wrapped arrival
      // is next-day and never peak, gtfs.go:66-84)
      .withColumn("peak", inPeak(col("dep_s")) ||
        (col("arr_s") >= col("dep_s") && inPeak(col("arr_s"))))
      .withColumn("travel_s",
        when(col("arr_s") < col("dep_s"), col("arr_s") + 86400 - col("dep_s"))
          .otherwise(col("arr_s") - col("dep_s")))
    pairs.groupBy(col("from_stop"), col("stop_id").as("to_stop"))
      .agg(
        (ceil(avg(when(col("peak"), col("travel_s"))) / 60.0) * 60).as("peak_s"),
        (ceil(avg(when(!col("peak"), col("travel_s"))) / 60.0) * 60).as("offpeak_s"))
  }

  /** Directed transit edge table for Graph.* with the chosen traffic class;
    * pairs without an observation in that class fall out (the reference
    * falls back to base weights there). */
  def transitEdges(spark: SparkSession, dir: String, peakTraffic: Boolean): DataFrame = {
    val s = stops(spark, dir).select(col("stop_id"), col("node_id"))
    val costCol = if (peakTraffic) col("peak_s") else col("offpeak_s")
    connections(spark, dir)
      .where(costCol.isNotNull)
      .join(s.withColumnRenamed("stop_id", "from_stop").withColumnRenamed("node_id", "src"), "from_stop")
      .join(s.withColumnRenamed("stop_id", "to_stop").withColumnRenamed("node_id", "dst"), "to_stop")
      .select(col("src"), col("dst"), costCol.cast("double").as("cost_m"))
  }
}
