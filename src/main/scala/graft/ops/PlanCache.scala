package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of cached DataFrames, keyed by an arbitrary
  * string (conventionally `"$dir|what"`). Shared by the dedup shingle
  * caches and the IVF centroid training so one expensive subtree is
  * computed once per (session, corpus) and every consumer reads the
  * cached copy.
  *
  * Dead sessions are swept on access — NOT weak-key GC, which cannot
  * fire here because the memoized DataFrames themselves reference their
  * session (value→key strong path, the WeakHashMap caveat); the
  * WeakHashMap still helps when a session is dropped without being
  * referenced by any retained value. Assumes the corpus under the key's
  * dir is immutable while memoized — if files change, call `clear()`.
  */
private[graft] object PlanCache {

  private val memo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  /** Memoize `build` as a cached DataFrame under (session, key). The
    * plan is built and `.cache()`d lazily — nothing materializes until a
    * query actually runs, so construction stays job-free. */
  def memoized(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      val it = memo.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      val perKey = memo.computeIfAbsent(s, _ => scala.collection.mutable.Map.empty)
      perKey.getOrElseUpdate(key, build.cache())
    }

  /** Unpersist and forget every memoized plan (library consumers call
    * this when done with a corpus, or after replacing corpus files).
    * Each unpersist is Try-wrapped so an already-stopped session cannot
    * abort the sweep and leak the remaining entries. */
  def clear(): Unit = memo.synchronized {
    memo.values.forEach(_.values.foreach(df => scala.util.Try(df.unpersist())))
    memo.clear()
  }

  /** Drop (and unpersist) this session's memoized plans whose key
    * starts with `prefix` — the targeted form of [[clear]] for index
    * maintenance: compaction swaps an index's files out from under any
    * memoized read of them. */
  def invalidate(s: SparkSession, prefix: String): Unit = memo.synchronized {
    Option(memo.get(s)).foreach { perKey =>
      perKey.keys.filter(_.startsWith(prefix)).toSeq.foreach { k =>
        scala.util.Try(perKey(k).unpersist())
        perKey -= k
      }
    }
  }
}
