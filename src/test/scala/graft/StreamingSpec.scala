package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Structured Streaming ≡ batch: the streaming tumbling-window counts
  * must equal the batch aggregation over the same parquet. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stream_hour_counts equals the batch hourly histogram") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.streamHourCounts(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables(spark, TestSpark.sf0001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stateful flatMapGroupsWithState final counts equal batch counts") {
    import org.apache.spark.sql.functions._
    val streamed = EventStreams.streamStatefulCounts(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = Tables(spark, TestSpark.sf0001, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed === batch)
  }
}
