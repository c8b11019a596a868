package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r6 diagnostics main (not part of the driver surface). */
object QProbe {
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
  def t(tag: String)(f: => Unit): Unit = {
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag rep$i ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def events = spark.read.parquet(s"$d/events.parquet")

    noop(graft.streaming.Streaming.sessionize(events, 30).orderBy("user_id", "session_idx"))

    t("sessions_full") {
      noop(graft.streaming.Streaming.sessionize(events, 30).orderBy("user_id", "session_idx"))
    }
    t("sessions_noorder") {
      noop(graft.streaming.Streaming.sessionize(events, 30))
    }
    locally {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      def windowed = events
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .withColumn("__new", when(col("__prev").isNull ||
          unix_micros(col("ts").cast("timestamp")) - unix_micros(col("__prev").cast("timestamp")) >
            30L * 60000000L, 1L).otherwise(0L))
      t("windows_only") { noop(windowed) }
      t("repart_sort_only") {
        noop(events.select("user_id", "ts").repartition(32, col("user_id"))
          .sortWithinPartitions("user_id", "ts"))
      }
      t("scan_only") { noop(events.select("user_id", "ts")) }
    }
    // rd_assign probe
    val tags = when(col("point_id") % 4 === 0, map(lit("#amenity"), lit("cafe")))
      .when(col("point_id") % 4 === 1, map(lit("#highway"), lit("footway")))
      .when(col("point_id") % 4 === 2, map(lit("#highway"), lit("primary")))
      .otherwise(map(lit("#place"), lit("city")))
    def world = graft.model.Fixtures.points(spark, d).withColumn("tags", tags)
    t("rd_assign_full") {
      val in = world.where(graft.render.RenderRules.zoomPredicate(13, col("tags")))
        .withColumn("layer", graft.render.RenderRules.layerColumn(col("tags")))
      noop(graft.operators.SpatialJoins.tileAssignment(in, 13)
        .groupBy(col("tile_xx").as("tx"), col("tile_yy").as("ty"), col("layer"))
        .agg(count(lit(1)).as("n")).orderBy("tx", "ty", "layer"))
    }
    t("rd_assign_scan") {
      val in = world.where(graft.render.RenderRules.zoomPredicate(13, col("tags")))
        .withColumn("layer", graft.render.RenderRules.layerColumn(col("tags")))
      noop(in)
    }
    t("points_scan") { noop(graft.model.Fixtures.points(spark, d)) }
    t("tags_built_only") { noop(world) }
    t("zoom_pred_only") {
      noop(world.where(graft.render.RenderRules.zoomPredicate(13, col("tags"))))
    }
    t("layer_only") {
      noop(world.withColumn("layer", graft.render.RenderRules.layerColumn(col("tags"))))
    }
    // mm_thumbs probe
    t("mm_thumbs_full") {
      noop(graft.operators.ImageOps.thumbnails(
        graft.model.Fixtures.images(spark, 5000L), 64).toDF()
        .select(col("image_id"), col("tw"), col("th"),
          length(col("thumb")).cast("int").as("thumb_len"))
        .orderBy("image_id"))
    }
    t("mm_images_scan") { noop(graft.model.Fixtures.images(spark, 5000L)) }
    spark.stop()
  }
}
