package graft

import graft.streaming.Streaming

class StreamingSpec extends SparkSuite {

  test("streaming windowed counts equal the batch plan over the same events") {
    val batch = Streaming.windowedEventCounts(
      spark.read.parquet(s"$sf001/events.parquet")).collect().toSet
    val streamed = Streaming.runStreamToMemory(spark, sf001, "st_counts").collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
