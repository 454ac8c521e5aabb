package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming scale experiment: drives the three PRODUCTION file-sink
  * streaming paths (`EventStreams.*ToFiles`) over a 100×-scale replay —
  * 5M events across 90 day-files, one file per micro-batch in event-time
  * order — and checks the two properties a 100 TB deployment cares about:
  *
  *  1. OUTPUT equals the batch recomputation (exactly for dedup and the
  *     interval join, which emit rows as soon as they are decided; up to
  *     the final watermark for the appended window aggregate, whose last
  *     open windows are still held — exactly the contract's semantics).
  *  2. STATE stays bounded by the watermark, not the corpus: a
  *     listener records the max state rows/bytes each query ever holds.
  *     With a 1-hour watermark over a 90-day replay the steady state is
  *     O(events-per-~2h), i.e. ~1% of the corpus — if state grew with
  *     the replay instead, these numbers would be ~100× larger.
  *
  * The checkpoint directory size is reported too (it bounds recovery
  * cost). Results go into the ScaleSmoke section of PLANS.md.
  *
  * Usage: runMain graft.StreamScale [dir] — feed is generated under
  * `dir` (default /tmp/streamscale) if absent.
  */
object StreamScale {
  private def say(msg: String): Unit = { println(s"SCALE $msg"); Console.flush() }

  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    say(f"$tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  val nEvents = 5000000L
  val nDays = 90

  /** State partitions for the replay, sized to its measured peak state
    * (≤~60k rows / ~160 MB across stores): a stateful micro-batch pays
    * one store commit per partition per store regardless of data volume
    * — at the session's 32 scan partitions the interval join (4 stores)
    * paid 4·32·90 = 11,520 commits and sat at ~357 s on BOTH the HDFS
    * and RocksDB providers. 8 partitions carry ~7.5k state rows each —
    * far under any memory bound — and cut the commit count 4×. A
    * deployment with GB-scale state raises this; the knob is the
    * `statePartitions` parameter on every `*ToFiles` path. */
  val replayStatePartitions = 8
  private val day0Micros = 1704067200L * 1000000L // 2024-01-01 UTC

  /** One parquet FILE per day, written in day order (so modification
    * times make the streaming file source replay them oldest-first =
    * event-time order, the property that lets the watermark advance
    * without dropping anything). `clean` has each event once; `doubled`
    * duplicates every row within its day file — the dedup input. */
  def generateFeed(s: SparkSession, dir: String): Unit = {
    val perDay = nEvents / nDays
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/clean"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/doubled"))
    for (d <- 0 until nDays) {
      val base = s.range(d * perDay, (d + 1) * perDay).select(
        col("id").as("event_id"),
        expr(s"timestamp_micros(${day0Micros + d * 86400000000L} + (cast(pmod(hash(id), 86400) as bigint) * 1000000))").as("ts"),
        pmod(col("id"), lit(10000L)).as("user_id"),
        // type from a hash, NOT id % 5: user_id is id % 10000 and
        // 10000 ≡ 0 (mod 5), so id % 5 would give every user a single
        // constant type — no user ever both clicks and errors, and the
        // stream-stream join check would pass vacuously on 0 = 0 rows
        element_at(array(lit("view"), lit("click"), lit("purchase"), lit("signup"), lit("error")),
          (pmod(hash(col("id") * 7 + 3), lit(5)) + 1).cast("int")).as("event_type"),
        (pmod(hash(col("id")), lit(10000L)).cast("double") / 100.0).as("value"))
      writeOneFile(s, base, f"$dir/clean/day_$d%02d.parquet")
      writeOneFile(s, base.union(base), f"$dir/doubled/day_$d%02d.parquet")
    }
  }

  /** Write `df` as exactly one parquet FILE at `dest` (the streaming
    * file source wants a flat directory of files, not subdirectories). */
  private def writeOneFile(s: SparkSession, df: DataFrame, dest: String): Unit = {
    val tmp = dest + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(dest),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  /** Max state rows / state bytes / checkpoint bytes seen by any
    * micro-batch of the queries run inside `f`. */
  private def withStateStats[A](s: SparkSession)(f: => A): (A, Long, Long) = {
    var maxRows = 0L
    var maxBytes = 0L
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) {
          maxRows = math.max(maxRows, ops.map(_.numRowsTotal).sum)
          maxBytes = math.max(maxBytes, ops.map(_.memoryUsedBytes).sum)
        }
      }
    }
    s.streams.addListener(l)
    try {
      val r = f
      Thread.sleep(2000) // listener bus is async; let the last progress land
      (r, maxRows, maxBytes)
    } finally s.streams.removeListener(l)
  }

  private def dirBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return 0L
    val stream = java.nio.file.Files.walk(root)
    try stream.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally stream.close()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/streamscale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).appName("graft-streamscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (!new java.io.File(s"$dir/clean/day_00.parquet").exists())
      time("generate feed (5M events, 90 day-files, + doubled copy)")(
        generateFeed(spark, dir))
    // fresh sinks/checkpoints every run — a stale checkpoint would turn
    // the replay into a no-op and "pass" on the previous run's output
    for (p <- Seq("out_hour", "ck_hour", "out_dedup", "ck_dedup", "out_join", "ck_join",
        "out_state", "ck_state"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/$p"))
    say(s"feed: $nEvents events over $nDays day-files, 1-hour watermark")

    val clean = spark.read.parquet(s"$dir/clean")

    // 1. watermarked append hourly histogram → files
    val (_, aggRows, aggBytes) = withStateStats(spark)(time("streamHourCountsToFiles (90 micro-batches)") {
      graft.streaming.EventStreams.streamHourCountsToFiles(
        spark, s"$dir/clean", s"$dir/out_hour", s"$dir/ck_hour",
        statePartitions = Some(replayStatePartitions))
    })
    val outHour = spark.read.parquet(s"$dir/out_hour")
    val batchHour = clean
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"))
    val emitted = outHour.count()
    // every emitted row must match batch exactly…
    val wrongRows = outHour.except(batchHour).count()
    // …and coverage must reach the final watermark: all windows ending
    // ≥2 h before the last event have provably been emitted
    val maxTs = clean.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val mustCover = batchHour.filter(
      unix_micros(col("hour")) + 3600000000L <= maxTs - 2L * 3600000000L).count()
    say(s"  hour agg: emitted=$emitted (batch total=${batchHour.count()}), " +
      s"wrong=$wrongRows, required-covered=$mustCover, " +
      s"maxStateRows=$aggRows maxStateMB=${aggBytes / 1024 / 1024} ckMB=${dirBytes(s"$dir/ck_hour") / 1024 / 1024}")
    assert(wrongRows == 0, "hour agg emitted a row that disagrees with batch")
    assert(emitted >= mustCover, "hour agg failed to emit windows the watermark had closed")

    // 2. watermark-bounded ingest dedup of the DOUBLED feed → files
    val (_, ddRows, ddBytes) = withStateStats(spark)(time("streamDedupToFiles (doubled feed, 90 micro-batches)") {
      graft.streaming.EventStreams.streamDedupToFiles(
        spark, s"$dir/doubled", s"$dir/out_dedup", s"$dir/ck_dedup",
        statePartitions = Some(replayStatePartitions))
    })
    val outDedup = spark.read.parquet(s"$dir/out_dedup")
    val dedupTotal = outDedup.count()
    val dedupDistinct = outDedup.select(col("event_id")).distinct().count()
    // per-day truncation: the feed holds (nEvents/nDays)*nDays events,
    // not nEvents — compare against the actual clean feed
    val feedEvents = clean.count()
    say(s"  dedup: emitted=$dedupTotal distinct=$dedupDistinct (expected $feedEvents), " +
      s"maxStateRows=$ddRows maxStateMB=${ddBytes / 1024 / 1024} ckMB=${dirBytes(s"$dir/ck_dedup") / 1024 / 1024}")
    assert(dedupTotal == feedEvents && dedupDistinct == feedEvents,
      s"stream dedup of doubled feed: $dedupTotal rows / $dedupDistinct distinct, want $feedEvents")

    // 3. stream-stream interval join → files
    val (_, jRows, jBytes) = withStateStats(spark)(time("streamStreamJoinToFiles (90 micro-batches)") {
      graft.streaming.EventStreams.streamStreamJoinToFiles(
        spark, s"$dir/clean", s"$dir/out_join", s"$dir/ck_join",
        statePartitions = Some(replayStatePartitions))
    })
    val outJoin = spark.read.parquet(s"$dir/out_join")
    val batchJoin = clean.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .join(clean.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"), col("ts").as("e_ts")), Seq("user_id"))
      .filter(col("e_ts") >= col("c_ts") &&
        unix_micros(col("e_ts")) - unix_micros(col("c_ts")) <= 300000000L)
      .select(col("user_id"), col("click_id"), col("err_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
    val joinDiff = outJoin.except(batchJoin).count() + batchJoin.except(outJoin).count()
    say(s"  join: emitted=${outJoin.count()} (batch=${batchJoin.count()}), symmetricDiff=$joinDiff, " +
      s"maxStateRows=$jRows maxStateMB=${jBytes / 1024 / 1024} ckMB=${dirBytes(s"$dir/ck_join") / 1024 / 1024}")
    assert(joinDiff == 0, "stream-stream join diverged from the batch interval join")

    // 4. changelog stateful counts → files (foreachBatch idempotent
    //    per-batch dynamic-partition overwrite), served back as the
    //    latest update per key — the fourth production path. State here
    //    is O(keys) (5 event types), NOT watermark-bounded: the check is
    //    that 90 update batches land, the serving view reconstructs the
    //    exact batch counts, and state/changelog stay O(keys·batches).
    val (_, scRows, scBytes) = withStateStats(spark)(time("streamStatefulCountsToFiles (90 micro-batches)") {
      graft.streaming.EventStreams.streamStatefulCountsToFiles(
        spark, s"$dir/clean", s"$dir/out_state", s"$dir/ck_state",
        statePartitions = Some(replayStatePartitions))
    })
    val servedCounts = graft.streaming.EventStreams
      .statefulCountsFromChangelog(spark, s"$dir/out_state")
    val batchCounts = clean.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    val countsDiff = servedCounts.select(col("event_type"), col("n_events"))
      .except(batchCounts).count() +
      batchCounts.except(servedCounts.select(col("event_type"), col("n_events"))).count()
    val changelogRows = spark.read.parquet(s"$dir/out_state").count()
    say(s"  stateful: servedKeys=${servedCounts.count()} changelogRows=$changelogRows " +
      s"diff-vs-batch=$countsDiff maxStateRows=$scRows maxStateMB=${scBytes / 1024 / 1024} " +
      s"ckMB=${dirBytes(s"$dir/ck_state") / 1024 / 1024}")
    assert(countsDiff == 0, "changelog serving view diverged from batch counts")
    assert(scRows <= 16, s"stateful-counts state ($scRows rows) exceeds O(keys)")

    // boundedness: steady-state is O(events within ~2 watermark spans),
    // i.e. ~2 hours of a 2160-hour replay — assert state never grew to
    // even 2% of the corpus (it would be ~100% if the watermark failed)
    val bound = (2 * nEvents) / 100
    for ((tag, n) <- Seq(("agg", aggRows), ("dedup", ddRows), ("join", jRows))) {
      say(f"  state-bound $tag%-6s $n%9d rows vs corpus $nEvents (${100.0 * n / nEvents}%.3f%%)")
      assert(n < bound, s"$tag state ($n rows) not watermark-bounded")
    }
    say("done")
    spark.stop()
  }
}
