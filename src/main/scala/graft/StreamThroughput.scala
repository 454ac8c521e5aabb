package graft

import org.apache.spark.sql.functions._

/** Streaming THROUGHPUT experiment — the other half of the 100 TB
  * streaming story after `StreamScale` proved state boundedness: where
  * is the events/sec knee in (micro-batch size × state partitions)?
  *
  * Drives the heaviest production path (the stream-stream interval
  * join, FOUR state stores) over the same 5M-event / 90 day-file feed
  * as StreamScale, on the RocksDB provider, across a grid of
  * `maxFilesPerTrigger` (events per micro-batch) × `statePartitions`
  * (state-store commits per micro-batch = 4·partitions). Output rows
  * are asserted identical to the batch recomputation on every cell —
  * a fast wrong answer is not a data point.
  *
  * The model this tests: wall ≈ nBatches·(commitFloor·stores·parts) +
  * dataWork. Bigger triggers amortize the per-batch commit cost but
  * raise per-batch state churn and latency; more partitions buy
  * parallel state capacity but multiply commit count. The knee is
  * where commit overhead stops dominating data work.
  *
  * Usage: runMain graft.StreamThroughput [dir]  (feed generated under
  * `dir` if absent — same generator as StreamScale).
  */
object StreamThroughput {
  private def say(msg: String): Unit = { println(s"THRU $msg"); Console.flush() }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/streamscale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .appName("graft-streamthroughput").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$dir/clean/day_00.parquet").exists())
      StreamScale.generateFeed(spark, dir)
    val clean = spark.read.parquet(s"$dir/clean")
    val expected = clean.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .join(clean.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("e_ts")), Seq("user_id"))
      .filter(col("e_ts") >= col("c_ts") &&
        unix_micros(col("e_ts")) - unix_micros(col("c_ts")) <= 300000000L)
      .count()
    val nEvents = clean.count()
    say(s"feed: $nEvents events, ${StreamScale.nDays} day-files; expected join rows=$expected")
    say(f"${"filesPerTrigger"}%16s ${"stateParts"}%10s ${"batches"}%8s ${"wall_s"}%8s ${"events_per_s"}%12s")

    for (filesPerTrigger <- Seq(1, 5, 15); parts <- Seq(8, 32)) {
      val tag = s"f$filesPerTrigger-p$parts"
      for (p <- Seq(s"$dir/thru_out_$tag", s"$dir/thru_ck_$tag"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
      val t0 = System.nanoTime()
      graft.streaming.EventStreams.streamStreamJoinToFiles(
        spark, s"$dir/clean", s"$dir/thru_out_$tag", s"$dir/thru_ck_$tag",
        maxFilesPerTrigger = filesPerTrigger, statePartitions = Some(parts))
      val wall = (System.nanoTime() - t0) / 1e9
      val got = spark.read.parquet(s"$dir/thru_out_$tag").count()
      assert(got == expected, s"$tag emitted $got rows, batch says $expected")
      val batches = math.ceil(StreamScale.nDays.toDouble / filesPerTrigger).toInt
      say(f"$filesPerTrigger%16d $parts%10d $batches%8d $wall%8.1f ${nEvents / wall}%12.0f")
    }
    say("done")
    spark.stop()
  }
}
