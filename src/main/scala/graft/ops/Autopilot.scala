package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Index AUTOPILOT — the round-8 health findings as an executable
  * policy. The health reports ([[AnnIndex.ivfIndexHealth]],
  * [[AnnIndex.lshIndexHealth]], [[TextAnalysis.textIndexHealth]]) give
  * a deployment the numbers to watch; this is the one entry point that
  * watches them: read the family's report, COMPACT when maintenance
  * debt (small files, pending tombstones, frozen-statistics staleness)
  * crosses its threshold, RETRAIN when quantizer drift does
  * (`hot_list_skew` / `hot_bucket_skew` — the drift experiment's
  * production lesson was that recall holds while list skew explodes,
  * so skew, not recall, is the alarm; 39.55 → 2.18 measured across one
  * retrain at recall 1.000).
  *
  * Thresholds are arguments with documented defaults, evaluated
  * against EXACTLY the metrics the oracled health queries emit — the
  * policy and the report can never disagree about a value. Every
  * trigger is returned as a decision row whether or not it fired, so
  * the autopilot's run log is itself the health audit trail.
  *
  * Retrain supersedes compact within one pass: the rebuild publishes a
  * fresh, few-file, tombstone-honoring table, so compacting first
  * would do the same file rewrite twice. Retrain needs the index's
  * corpus definition (`corpusDirs`); when drift fires without one, the
  * decision row reports the unperformed action loudly rather than
  * guessing.
  */
object Autopilot {

  /** Quantizer-drift alarm for IVF list skew (max/mean nonempty list).
    * A balanced index sits near 1–3; the drift experiment measured
    * 39.55 on a mean-shifted corpus and 2.18 after retrain. */
  val maxHotListSkew = 8.0

  /** LSH bucket-skew alarm. Bucket-size baselines are GEOMETRY
    * dependent (the near-orthogonal synthetic corpus measures ~650
    * hot-bucket skew while serving fine; clustered corpora sit far
    * lower), so this default is deliberately high — calibrate from a
    * healthy baseline per corpus family, as with any alarm. */
  val maxHotBucketSkew = 1000.0

  /** Small-file (compaction) debt: landing appends accumulate one file
    * group per batch; past this many files a serve pays more in
    * listings/footers than in data. ~N files also bounds what a single
    * compact rewrites. */
  val maxDataFiles = 12

  /** Frozen-statistics staleness share for the text index:
    * |n_docs_indexed − stats_n_docs| / stats_n_docs. Lucene's gap
    * between commits and merges — past 20% the BM25 idf/avgdl are
    * estimated on a corpus fifth different from the one being served. */
  val maxStalenessShare = 0.2

  /** Bloom saturation alarm for the decontamination index: cumulative
    * inserts over the filter's sized capacity (the round-8 accounting
    * `decontamBloomAppend` warns on). Past 1.0 the actual FP rate
    * exceeds the built fpp — the exact-confirm tier absorbs the extra
    * false positives (correctness holds) but every FP pays a confirm
    * join, so the screen tier is decaying toward a no-op. The fix is
    * the compact's REBUILD at fresh geometry (2× the surviving count). */
  val maxBloomSaturation = 1.0

  /** Backstop bound on un-absorbed APPEND BATCHES for
    * [[maintenanceDue]]'s file-debt leg — callers running a cadence
    * FLOOR must pass their own floor (the streaming loops pass
    * `ingestCompactEvery`): the leg is meant to fire only when the
    * floor's compaction failed to absorb, so a default below a
    * caller's floor would re-create the compact-per-trigger latch the
    * round-12 A/B measured at +20–40%. */
  val maxUnabsorbedBatches = 10

  private def exists(s: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(s.sparkContext.hadoopConfiguration).exists(path)
  }

  private def healthMap(df: DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Process-level bloom saturation memo: qualified bloom dir →
    * (file-set fingerprint, saturation share, schema-upgraded). The
    * per-trigger alarm must not pay a Spark read per call — the 1-row
    * parquet read is a ~200 ms job, and the decontam ingest loop
    * rewrites the bloom EVERY trigger, so a read-on-change memo alone
    * would still re-read per trigger. Instead the ONE bloom writer
    * ([[Curation]]'s writeBloomRow]) notes the saturation it just
    * published via [[noteBloomSaturation]]; any change from outside
    * this process flips the fingerprint and forces a single re-read. */
  private val bloomSatMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Double, Boolean)]()

  private def bloomFingerprint(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String =
    f.listStatus(p).filter(_.isFile)
      .map(st => s"${st.getPath.getName}:${st.getLen}")
      .sorted.mkString("|")

  /** Fingerprint of a bloom table's file set for the memo protocol —
    * the WRITER takes this of its STAGING dir BEFORE the publish
    * rename, so a concurrent external rewrite landing right after the
    * rename can never be memoized under OUR saturation: the on-disk
    * fingerprint would be theirs, ours mismatches, and the next probe
    * re-reads. Listing the destination after the rename had exactly
    * that poisoning window. Names + lengths only, NO mtimes: Spark's
    * per-write UUID part names already make the pair collision-safe,
    * and on copy-based filesystems (object stores where rename = copy)
    * mtimes do NOT survive the publish rename — an mtime term silently
    * degraded the memo to a parquet read per streaming trigger there,
    * the exact cost it exists to avoid. */
  private[graft] def bloomFingerprintOf(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    bloomFingerprint(p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Called by the bloom writer right after its publish rename, with
    * the counters it just wrote and the STAGING-dir fingerprint taken
    * before the rename — keeps [[bloomSaturationOf]] a pure FS-listing
    * check on the hot per-trigger path. */
  private[graft] def noteBloomSaturation(s: SparkSession, bloomDir: String,
      fingerprint: String, nItems: Long, totalItems: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(bloomDir)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    bloomSatMemo.put(f.makeQualified(p).toString,
      (fingerprint, totalItems.toDouble / math.max(1.0, nItems.toDouble), true))
  }

  /** A bloom table's (saturation share, schema-upgraded) — the ONE
    * pre-upgrade guard [[indexAutopilot]] and [[maintenanceDue]] share:
    * rows without `total_items` report the n_items LOWER BOUND 1.0
    * (exactly full, total unknown — never over), flagged `upgraded =
    * false` so callers can say so instead of presenting it as measured
    * (same schema rule as `Curation.loadBloom`). Served from the
    * writer-fed fingerprint memo when current; one parquet read
    * otherwise (cold process or an external rewrite). */
  private[graft] def bloomSaturationOf(
      s: SparkSession, bloomDir: String): (Double, Boolean) = {
    val p = new org.apache.hadoop.fs.Path(bloomDir)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val key = f.makeQualified(p).toString
    val fp = bloomFingerprint(f, p)
    Option(bloomSatMemo.get(key)).filter(_._1 == fp)
      .map(c => (c._2, c._3)).getOrElse {
        val m = s.read.parquet(bloomDir)
        val upgraded = m.schema.fieldNames.contains("total_items")
        val r = m.select(col("n_items"),
          if (upgraded) col("total_items") else col("n_items")).head()
        val sat = r.getLong(1).toDouble / math.max(1.0, r.getLong(0).toDouble)
        bloomSatMemo.put(key, (fp, sat, upgraded))
        (sat, upgraded)
      }
  }

  /** Cheap per-trigger maintenance alarm — the autopilot's debt
    * triggers evaluated from FS LISTINGS and one 1-row metadata read
    * only, no data aggregation: this runs inside a streaming
    * foreachBatch on EVERY trigger, so the steady-state per-trigger
    * cost must stay flat (the aggregation-priced drift alarms —
    * list/bucket skew, staleness share — stay on [[indexAutopilot]]'s
    * on-demand pass, whose fix is a retrain, not a cadence compaction).
    *
    * True when any table under `dirs` carries more un-absorbed APPEND
    * BATCHES (distinct sequence stamps among its stamped files) than
    * `maxAppendedBatches`, any pending tombstones, or a decontam
    * bloom's saturation share over `bloomSaturationMax`. All three
    * signals RESET at the compaction they trigger — appends absorb
    * into unstamped rewrites, tombstones retire, the bloom rebuilds at
    * fresh geometry — so the alarm can never latch. The file leg
    * counts BATCHES, not files: an append lands one file per shuffle
    * partition (32 at the bench SF), so a file-count threshold fires
    * on the very first normal append and turns the cadence into a
    * rewrite per trigger (measured +40% on the ingest family before
    * this was caught); batch count can only exceed the floor when the
    * floor's own compaction failed to absorb — a genuine anomaly, so
    * this leg is a self-healing backstop, while the tombstone and
    * saturation legs are the real early triggers. Sink dirs append
    * unstamped files and stay bounded by the cadence FLOOR, as before.
    * A dir entry may be an index dir (table subdirs are probed) or a
    * bare table/sink dir of parquet files. */
  def maintenanceDue(s: SparkSession, dirs: Seq[String],
      maxAppendedBatches: Int = maxUnabsorbedBatches,
      bloomSaturationMax: Double = maxBloomSaturation): Boolean =
    dirs.exists { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      f.exists(p) && {
        val subs = f.listStatus(p).toSeq.filter(st => st.isDirectory &&
          !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        val tables = if (subs.isEmpty) Seq(d) else subs.map(_.getPath.toString)
        val debt = tables.exists { t =>
          // stamp grammar owned by IndexMaintenance (fileSeqOf) — a
          // second regex copy here would go silently dead if the
          // naming ever changes again
          IndexMaintenance.appendedTailFiles(s, t)
            .map(n => IndexMaintenance.fileSeqOf(
              new org.apache.hadoop.fs.Path(n).getName))
            .distinct.size > maxAppendedBatches ||
            IndexMaintenance.pendingTombstones(s, t).isDefined
        }
        debt || {
          val bloomP = new org.apache.hadoop.fs.Path(s"$d/bloom")
          f.exists(bloomP) && bloomSaturationOf(s, s"$d/bloom")._1 > bloomSaturationMax
        }
      }
    }

  /** Run the autopilot pass on the index at `indexDir` (families
    * detected from the on-disk layout: buckets+meta = LSH,
    * lists+codebook = IVF-PQ, lists+centroids = IVF, postings+doclen =
    * text, bloom+eval_shingles = decontamination, simhash = dedup
    * signature store, seed/b<i>/c<n> = token ledger — an
    * ingest-manifest index legitimately carries bloom+simhash side by
    * side, and both are evaluated). Returns the
    * decision log: one row per evaluated trigger —
    * (family, trigger, value, threshold, action, performed). */
  def indexAutopilot(s: SparkSession, indexDir: String,
      corpusDirs: Seq[String] = Seq.empty,
      hotListSkewMax: Double = maxHotListSkew,
      hotBucketSkewMax: Double = maxHotBucketSkew,
      dataFilesMax: Int = maxDataFiles,
      stalenessShareMax: Double = maxStalenessShare,
      bloomSaturationMax: Double = maxBloomSaturation): DataFrame = {
    import s.implicits._
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Double, Double, String, Boolean)]()
    var matched = false

    // file/tombstone maintenance debt of one table — the same values
    // the oracled health reports emit for their families
    def debtOf(table: String): (Double, Double) = (
      IndexMaintenance.dataFiles(s, table).size.toDouble,
      IndexMaintenance.pendingTombstones(s, table)
        .map(_.count().toDouble).getOrElse(0.0))

    def vectorFamily(family: String, skewMetric: String, skewMax: Double,
        health: => Map[String, Double],
        retrain: () => Unit, compact: () => Unit): Unit = {
      val h = health
      val skew = h.getOrElse(skewMetric, 0.0)
      val files = h.getOrElse("data_files", 0.0)
      val pend = h.getOrElse("pending_tombstones", 0.0)
      val wantRetrain = skew > skewMax
      val canRetrain = wantRetrain && corpusDirs.nonEmpty
      if (canRetrain) retrain()
      rows += ((family, skewMetric, skew, skewMax,
        if (wantRetrain && !canRetrain) "retrain_needs_corpus" else "retrain", canRetrain))
      val wantCompact = !canRetrain && (files > dataFilesMax || pend > 0)
      if (wantCompact) compact()
      rows += ((family, "data_files", files, dataFilesMax.toDouble,
        if (canRetrain) "compact_superseded_by_retrain" else "compact",
        wantCompact && files > dataFilesMax))
      rows += ((family, "pending_tombstones", pend, 0.0,
        if (canRetrain) "compact_superseded_by_retrain" else "compact",
        wantCompact && pend > 0))
    }

    if (exists(s, s"$indexDir/buckets") && exists(s, s"$indexDir/meta")) {
      matched = true
      vectorFamily("lsh", "hot_bucket_skew", hotBucketSkewMax,
        healthMap(AnnIndex.lshIndexHealth(s, indexDir)),
        () => AnnIndex.lshIndexRetrain(s, indexDir, corpusDirs),
        () => { AnnIndex.lshIndexCompact(s, indexDir); () })
    } else if (exists(s, s"$indexDir/lists") && exists(s, s"$indexDir/codebook")) {
      matched = true
      vectorFamily("ivfpq", "hot_list_skew", hotListSkewMax,
        healthMap(AnnIndex.ivfIndexHealth(s, indexDir)),
        () => AnnIndex.ivfPqIndexRetrain(s, indexDir, corpusDirs),
        () => { AnnIndex.ivfPqIndexCompact(s, indexDir); () })
    } else if (exists(s, s"$indexDir/lists") && exists(s, s"$indexDir/centroids")) {
      matched = true
      vectorFamily("ivf", "hot_list_skew", hotListSkewMax,
        healthMap(AnnIndex.ivfIndexHealth(s, indexDir)),
        () => AnnIndex.ivfIndexRetrain(s, indexDir, corpusDirs),
        () => { AnnIndex.ivfIndexCompact(s, indexDir); () })
    } else if (exists(s, s"$indexDir/postings") && exists(s, s"$indexDir/doclen")) {
      matched = true
      val h = healthMap(TextAnalysis.textIndexHealth(s, indexDir))
      val statsDocs = math.max(1.0, h.getOrElse("stats_n_docs", 0.0))
      val stale = math.abs(h.getOrElse("stats_staleness", 0.0)) / statsDocs
      val files = h.getOrElse("data_files", 0.0)
      val pend = h.getOrElse("pending_tombstones", 0.0)
      val wantCompact = stale > stalenessShareMax || files > dataFilesMax || pend > 0
      if (wantCompact) TextAnalysis.textIndexCompact(s, indexDir)
      rows += (("text", "stats_staleness_share", stale, stalenessShareMax,
        "compact", wantCompact && stale > stalenessShareMax))
      rows += (("text", "data_files", files, dataFilesMax.toDouble,
        "compact", wantCompact && files > dataFilesMax))
      rows += (("text", "pending_tombstones", pend, 0.0,
        "compact", wantCompact && pend > 0))
    }

    // DECONTAMINATION family (bloom + eval shingle table). The bloom's
    // saturation share is the round-8 capacity accounting the append
    // path warns on (cumulative inserts / sized capacity, both read
    // from the persisted bloom row); past the threshold the filter's
    // actual FP rate exceeds its built fpp, and the ONE fix for a
    // saturated (or retraction-stale) bloom is the compact's rebuild at
    // fresh geometry — bits cannot be unset or extended in place.
    if (exists(s, s"$indexDir/bloom") && exists(s, s"$indexDir/eval_shingles")) {
      matched = true
      // pre-upgrade bloom rows lack total_items — the shared
      // [[bloomSaturationOf]] guard reports the n_items LOWER BOUND
      // 1.0 with upgraded = false, and the decision row says so in its
      // action column (the r11 advice: a caller alarming below 1.0
      // sees every pre-upgrade bloom flagged until its first rebuild
      // writes the upgraded row — the row must read as "total
      // unknown", not as a measured exactly-full filter).
      val (sat, upgraded) = bloomSaturationOf(s, s"$indexDir/bloom")
      val (files, pend) = debtOf(s"$indexDir/eval_shingles")
      val wantRebuild = sat > bloomSaturationMax
      val wantCompact = wantRebuild || files > dataFilesMax || pend > 0
      if (wantCompact) Curation.decontamIndexCompact(s, indexDir)
      rows += (("decontam", "bloom_saturation_share", sat, bloomSaturationMax,
        if (upgraded) "rebuild_bloom"
        else "rebuild_bloom_preupgrade_total_unknown", wantRebuild))
      rows += (("decontam", "data_files", files, dataFilesMax.toDouble,
        "compact", wantCompact && files > dataFilesMax))
      rows += (("decontam", "pending_tombstones", pend, 0.0,
        "compact", wantCompact && pend > 0))
    }

    // DEDUP SIGNATURE family (simhash store, plus the clean-text store
    // when the dir is a curating ingest index). Signatures carry no
    // corpus-dependent parameters (no drift, no retrain) — the only
    // maintenance is file/tombstone debt, fixed by the ingest compact
    // (which also covers the clean store when present).
    if (exists(s, s"$indexDir/simhash")) {
      matched = true
      val (sf, sp) = debtOf(s"$indexDir/simhash")
      val (cf, cp) =
        if (exists(s, s"$indexDir/clean")) debtOf(s"$indexDir/clean") else (0.0, 0.0)
      val files = sf + cf
      val pend = sp + cp
      val wantCompact = files > dataFilesMax || pend > 0
      if (wantCompact) Dedup.ingestIndexCompact(s, indexDir)
      rows += (("signature", "data_files", files, dataFilesMax.toDouble,
        "compact", wantCompact && files > dataFilesMax))
      rows += (("signature", "pending_tombstones", pend, 0.0,
        "compact", wantCompact && pend > 0))
    }

    // TOKEN LEDGER family (seed/b<i>/c<n> rollup grammar — round 15).
    // The ledger's maintenance debt is live part-DIRECTORY count (no
    // stamped appends, tombstones, or bloom — the index-shaped alarms
    // are constant-false on it): `unrolled_batches` past the backstop
    // means the stream's own cadence compaction is failing to absorb,
    // and `covered_garbage` means a crashed sweep (or a copy-rename
    // crash's uncommitted rollup) left dirs every totals read re-lists.
    // Both are fixed by one rollup-all pass, whose lazy sweep also
    // collects the garbage.
    if (!matched && graft.streaming.TextIngest.isLedgerDir(s, indexDir)) {
      matched = true
      // listing-only stats, NOT the full health report: the decision
      // consumes two directory-listing numbers, and the report's
      // totals leg is a Spark aggregation (with a torn-read retry
      // budget under churn) that a per-pass alarm must not pay — the
      // same rule the bloom saturation memo enforces for its family
      val (_, unrolledN, _, garbageN) =
        graft.streaming.TextIngest.ledgerListingStats(s, indexDir)
      val unrolled = unrolledN.toDouble
      val garbage = garbageN.toDouble
      val wantRollup = unrolled > maxUnabsorbedBatches || garbage > 0
      // the rollup can REFUSE (a torn live part must not be absorbed as
      // zero rows — see ledgerCompact); the decision log must say so
      // instead of claiming an absorb that never happened while the
      // unrolled_batches debt persists across "performed" passes. The
      // lazy sweep runs on every invocation regardless of the refusal,
      // so the garbage leg's `performed` stays truthful either way.
      val outcome = if (wantRollup)
        graft.streaming.TextIngest.ledgerRollupAll(s, indexDir) else ""
      val refused = outcome == graft.streaming.TextIngest.RollupRefusedTornPart
      rows += (("ledger", "unrolled_batches", unrolled, maxUnabsorbedBatches.toDouble,
        if (refused) outcome else "rollup",
        wantRollup && unrolled > maxUnabsorbedBatches && !refused))
      rows += (("ledger", "covered_garbage", garbage, 0.0,
        if (refused) outcome else "rollup", wantRollup && garbage > 0))
    }

    if (!matched) throw new IllegalArgumentException(
      s"indexAutopilot: no known index family at $indexDir " +
      "(want buckets+meta, lists+centroids[+codebook], postings+doclen, " +
      "bloom+eval_shingles, simhash, or a seed/b<i>/c<n> token ledger)")

    rows.toSeq.toDF("family", "trigger", "value", "threshold", "action", "performed")
  }
}
