package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Compaction for the persisted-index landing zones.
  *
  * Every `*IndexAppend` writes its batch as new parquet files next to
  * the standing ones — correct (appends never rewrite the standing
  * corpus) but monotonic: a year of daily landing batches leaves the
  * bucket/list/posting tables as thousands of small files, and at
  * serve time every one costs a listing entry, a footer read, and a
  * task. Compaction is the standard maintenance move: rewrite the
  * table as few well-sized files, SORTED on its serve key, then swap.
  *
  * The sort is not cosmetic — it is what restores serve-time pruning
  * as the table grows: row-group min/max stats on the sort key let a
  * pushed predicate (`term IN (...)` for postings, the probed c_id set
  * for IVF lists) skip row groups entirely, which an
  * append-interleaved layout defeats.
  *
  * The swap is write-to-temp + delete + rename (same publish pattern
  * as the bloom index): readers see the old or the new file set, never
  * a mix. Serve results are IDENTICAL before/after — compaction
  * changes layout, not content — pinned in `AnnIndexSpec`.
  */
object IndexMaintenance {

  /** Target output file size. 128 MB ≈ one HDFS block / one scan task
    * per file — the conventional operating point. */
  val targetFileBytes: Long = 128L * 1024 * 1024

  private def fs(s: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Parquet data files currently making up `path` (ignores _SUCCESS
    * and hidden files). */
  private[graft] def dataFiles(s: SparkSession, path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(s, p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
  }

  /** Rewrite the parquet table at `path` as ceil(bytes/128 MB) files
    * range-partitioned + sorted on `sortCols`, swap it in, and return
    * (files before, files after). A no-op single-file table still
    * rewrites (the sort may be new), which keeps the contract simple:
    * after compact, the table IS sorted. When `tombstoneCol` is given,
    * rows whose id is tombstoned (see [[deleteIds]]) are PHYSICALLY
    * dropped by the rewrite — and because the tombstone table lives
    * INSIDE the table dir, the swap clears it in the same atomic
    * rename: after compact, the table holds only surviving rows and
    * carries no pending deletes. */
  def compactTable(s: SparkSession, path: String, sortCols: Seq[String],
      tombstoneCol: Option[String] = None): (Int, Int) = {
    val before = dataFiles(s, path)
    require(before.nonEmpty, s"compactTable: nothing to compact at $path")
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val keys = sortCols.map(col)
    val dest = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(
      dest.getParent, s".${dest.getName}.compact.tmp")
    val base = s.read.parquet(path)
    tombstoneCol.fold(base)(c => minusTombstones(s, path, base, c))
      .repartitionByRange(nOut, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(tmp.toString)
    val f = fs(s, dest)
    f.delete(dest, true)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"compactTable: rename $tmp -> $dest failed")
    (before.size, dataFiles(s, path).size)
  }

  // ------------------------------------------------- delete / retraction
  //
  // Takedown (opt-out, contaminated-source retraction) is routine at
  // training-data scale, and an append-only index family needs a
  // defined path for it. The move is the standard LSM one: a DELETE
  // appends the id to a tiny tombstone table stored INSIDE the index
  // table's directory (`_tombstones` — the underscore prefix keeps
  // every parquet read of the table itself from seeing it), serving
  // anti-joins the tombstones out IMMEDIATELY (a deleted doc is gone
  // from the next query, no rebuild on the critical path), and the
  // next compaction physically drops the rows — the directory swap
  // clears the tombstones in the same atomic rename. Deletes are
  // idempotent by construction: a double delete appends a duplicate
  // tombstone row, and both the serve-time anti-join and the compact
  // rewrite are set operations.
  //
  // One deliberate simplification vs a full LSM: tombstones carry no
  // sequence numbers, so RE-ADDING a deleted id only takes effect
  // after a compaction has cleared the pending tombstone (a pending
  // delete hides re-added rows too — tombstone wins). Takedown
  // workflows never need the reverse order; a true re-admission is
  // delete → compact → append.

  /** Tombstone ids against the parquet table at `tablePath`. */
  def deleteIds(s: SparkSession, tablePath: String, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "deleteIds: empty id list")
    import s.implicits._
    ids.toDF("id").coalesce(1)
      .write.mode("append").parquet(s"$tablePath/_tombstones")
  }

  /** Pending tombstoned ids of `tablePath`, if any. */
  def pendingTombstones(s: SparkSession, tablePath: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$tablePath/_tombstones")
    if (fs(s, p).exists(p)) Some(s.read.parquet(p.toString).select(col("id")).distinct())
    else None
  }

  /** `df` minus rows whose `idCol` is tombstoned at `tablePath` — the
    * serve-time filter every index read applies. Zero plan overhead
    * when no delete is pending (the common case: no tombstone dir, no
    * join). */
  def minusTombstones(s: SparkSession, tablePath: String, df: DataFrame,
      idCol: String): DataFrame =
    pendingTombstones(s, tablePath).fold(df) { t =>
      df.join(t.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
    }
}
