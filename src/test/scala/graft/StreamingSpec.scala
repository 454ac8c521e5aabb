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

  test("watermark drops late data in append mode (MemoryStream, manual batches)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val name = "wm_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      input.addData((t(0), "a"), (t(1), "a"))   // window [10:00,10:10)
      q.processAllAvailable()
      input.addData((t(31), "a"))               // watermark -> 10:21, closes [10:00,10:10)
      q.processAllAvailable()
      input.addData((t(2), "late"))             // far behind watermark: dropped
      input.addData((t(45), "a"))               // push watermark further
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name)
      .select(col("window.start").cast("string"), col("k"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("2024-01-01 10:00:00", "a", 2L)), s"closed window missing: $rows")
    assert(!rows.exists(_._2 == "late"), s"late row leaked into results: $rows")
  }

  test("production file-sink append stream equals the batch hourly histogram") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("fsink")
    val src = base.resolve("src"); java.nio.file.Files.createDirectories(src)
    // stage sf0.001 events as several ts-ordered parquet files (ascending
    // mod-times => oldest-first admission) plus a far-future sentinel
    // event whose watermark advance closes every real window — append
    // mode only emits a window once the watermark passes its end
    val ev = Tables(spark, TestSpark.sf0001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("ts"))
    val rows = ev.collect()
    val schema = ev.schema
    val maxTs = rows.last.getTimestamp(1)
    val chunks = rows.toSeq.grouped(rows.length / 3 + 1).map(_.toSeq).toSeq
    val sentinel = org.apache.spark.sql.Row(
      -1L, new java.sql.Timestamp(maxTs.getTime + 3 * 3600 * 1000L), -1L, "sentinel", 0.0)
    (chunks :+ Seq(sentinel)).zipWithIndex.foreach { case (chunk, i) =>
      val stage = base.resolve(s"stage$i")
      spark.createDataFrame(chunk.asJava, schema).coalesce(1)
        .write.parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = src.resolve(f"events-$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    graft.streaming.EventStreams.streamHourCountsToFiles(
      spark, src.toString, base.resolve("out").toString, base.resolve("ckpt").toString)
    val got = spark.read.parquet(base.resolve("out").toString)
      .filter(col("event_type") =!= "sentinel")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = Tables(spark, TestSpark.sf0001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got === want)
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
