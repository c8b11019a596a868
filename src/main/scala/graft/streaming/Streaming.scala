package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Structured Streaming ingest path. The reference itself is batch-only
 * (SURVEY.md §2 Streaming: none), but the engine exposes the streaming
 * equivalents of its ingest + aggregation plane: watermarked event-time
 * windows over an append stream, with `foreachBatch`-style merge available for
 * feature mutation at scale.
 */
object Streaming {

  /** Watermarked hourly (by default) windowed aggregate; works on both batch
    * and streaming DataFrames (identical results by construction). */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    // watermarks require TIMESTAMP (LTZ); parquet testdata carries NTZ. The
    // session runs in UTC, so the LTZ<->NTZ casts are value-preserving; the
    // output is normalised to NTZ in both modes (oracle-comparable).
    val src0 = events.withColumn("__ts", col("ts").cast("timestamp"))
    val src = if (events.isStreaming) src0.withWatermark("__ts", watermark) else src0
    src.groupBy(window(col("__ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .select(col("w.start").cast("timestamp_ntz").as("wstart"),
        col("event_type"), col("n"), col("min_v"), col("max_v"))
  }

  /** Run a streaming query over parquet-backed events into an in-memory table
    * and return the materialised result (local smoke / tests). */
  def runStreamToMemory(spark: SparkSession, dir: String, name: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource ingests directories; stage the single parquet file
    // into a temp dir (stands in for an arriving-files ingest directory)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
    val q = windowedEventCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
