package graft.ops

import org.apache.spark.sql.SparkSession

/** ARTIFACT-KEYED decision memo for the bounded serving paths (round
  * 16): the MaxScore serves re-derive a pruning decision — dictionary
  * collect, cheap-postings floor scan, per-query mode classification —
  * that is a PURE FUNCTION of the persisted index's on-disk state and
  * the serve parameters. A deployment serving a frozen index pays that
  * decision once per index GENERATION, not once per query: this memo
  * keys each decision by a fingerprint of the index's file listing and
  * serves the cached value for as long as the listing stands,
  * byte-identical to a recompute by determinism.
  *
  * INVALIDATION is the file set itself, not an explicit hook: every
  * mutation of an index under [[IndexMaintenance]] changes file NAMES
  * (appends land sequence-stamped files, compacts/rebuilds rewrite
  * UUID part names, deletes append tombstone files under
  * `_tombstones`, stats rewrites re-rename) — so the fingerprint
  * (recursive name+length listing) moves on every append/compact/
  * delete/retrain and the next probe recomputes. No mtimes, for the
  * same reason as the bloom-saturation memo: object-store renames are
  * copies and do not preserve them, and names+lengths are already
  * collision-safe under Spark's per-write UUID naming.
  *
  * The fingerprint costs one `listStatus` per table dir (~5 RPCs on a
  * text index) — proportional to the index's FILE count (bounded by
  * the compaction cadence), and exactly the listing the serve's
  * segment probe ([[IndexMaintenance.appendedTailFiles]]) already pays
  * per call, so the memo adds no new scale dependence — against a
  * decision pass that costs a bounded Spark scan plus several driver
  * actions (~0.3 s measured at local[32], more at cluster latencies).
  *
  * CONCURRENCY: the fingerprint is taken BEFORE the compute and the
  * value is stored under it. A writer racing the compute leaves the
  * on-disk listing different from the stored fingerprint, so the next
  * probe misses and recomputes — the racing call itself returns what
  * an unmemoized call would have (the serve paths' documented
  * decision-time snapshot semantics; the `_now` forms close that race
  * by materializing, exactly as before). Values must be immutable
  * (decision payloads are; cached frames pin their data on first
  * materialization).
  *
  * Entry count is bounded by (artifact dirs × serve-parameter
  * combinations) in one JVM; [[PlanCache.clear]] drains it with the
  * other artifact memos (same corpus-immutability assumption).
  */
private[graft] object DecisionMemo {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Any)]()

  /** Probe counters — the spec pins hit/miss behavior through these
    * (a hit must not re-run the decision's Spark actions; an index
    * mutation must force a miss). */
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong()
  private[graft] val misses = new java.util.concurrent.atomic.AtomicLong()

  PlanCache.onClear("DecisionMemo.memo")(() => memo.clear())

  /** Recursive name+length fingerprint of the artifact directory (depth
    * ≤ 3: index dir → table dirs → files and `_tombstones`/`_batches`
    * marker subdirs → their files). Sorted, so listing order never
    * fingerprints. A vanished dir mid-walk folds in as a GONE token —
    * unique, so a snapshot taken mid-swap can never be served twice. */
  private[graft] def indexFingerprint(s: SparkSession, indexDir: String): String = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val f = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val sb = new StringBuilder
    def walk(p: org.apache.hadoop.fs.Path, depth: Int): Unit = {
      val entries =
        try f.listStatus(p).sortBy(_.getPath.getName)
        catch { case _: java.io.FileNotFoundException =>
          sb.append(p.getName).append(":GONE-").append(System.nanoTime()).append('\n')
          return
        }
      entries.foreach { st =>
        if (st.isFile)
          sb.append(st.getPath.toString).append(':').append(st.getLen).append('\n')
        else if (depth > 0) walk(st.getPath, depth - 1)
      }
    }
    if (f.exists(root)) walk(root, 3)
    sb.toString
  }

  /** Serve `compute`'s value for (artifact at `indexDir`, `key`) as
    * long as the index's file listing stands; recompute on any change.
    * `key` must carry every serve parameter the value depends on. */
  private[graft] def cached[T](s: SparkSession, indexDir: String, key: String)(
      compute: => T): T = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val qualified = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
    val k = s"$qualified|$key"
    val fp = indexFingerprint(s, indexDir)
    memo.get(k) match {
      case (prev, v) if prev == fp =>
        hits.incrementAndGet()
        v.asInstanceOf[T]
      case _ =>
        misses.incrementAndGet()
        val v = compute
        release(memo.put(k, (fp, v)))
        v
    }
  }

  /** [[cached]] for DISTRIBUTED frame payloads (round 17, r16 verdict
    * item 2): the value is a `.cache()`d DataFrame, so the memoized
    * ranks live in executor storage, never on the driver — the r16
    * collected-snapshot form held queries × top-k ≈ corpus/5 ROWS in
    * this JVM map, unbounded at the 100 TB design point. Fingerprint /
    * invalidation / hit-miss semantics are [[cached]]'s; the evicted
    * generation's frame is unpersisted (consumers still holding it
    * recompute from lineage — unpersist never invalidates a frame).
    * The Option form exists for decisions that may conclude "no bound
    * applies" (the hybrid MaxScore serve): the None is itself the
    * memoized decision. */
  private[graft] def cachedDf(s: SparkSession, indexDir: String, key: String)(
      compute: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cached(s, indexDir, key)(compute.cache())

  private[graft] def cachedDfOpt(s: SparkSession, indexDir: String, key: String)(
      compute: => Option[org.apache.spark.sql.DataFrame]): Option[org.apache.spark.sql.DataFrame] =
    cached(s, indexDir, key)(compute.map(_.cache()))

  /** Unpersist any cached-frame payload of a dropped entry. */
  private def release(e: (String, Any)): Unit = e match {
    case null => ()
    case (_, df: org.apache.spark.sql.Dataset[_]) =>
      scala.util.Try(df.unpersist())
    case (_, Some(df: org.apache.spark.sql.Dataset[_])) =>
      scala.util.Try(df.unpersist())
    case _ => ()
  }

  /** Drop every memoized decision (cached-frame payloads unpersisted) —
    * the bench's between-reps reset, instrumentation that prices the
    * COLD decision pass deliberately (ScaleSmoke), and tests. */
  private[graft] def clear(): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) { release(it.next().getValue); it.remove() }
  }
}
