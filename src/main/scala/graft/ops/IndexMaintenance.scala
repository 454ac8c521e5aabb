package graft.ops

import org.apache.spark.sql.SparkSession
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
    * after compact, the table IS sorted. */
  def compactTable(s: SparkSession, path: String, sortCols: Seq[String]): (Int, Int) = {
    val before = dataFiles(s, path)
    require(before.nonEmpty, s"compactTable: nothing to compact at $path")
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val keys = sortCols.map(col)
    val dest = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(
      dest.getParent, s".${dest.getName}.compact.tmp")
    s.read.parquet(path)
      .repartitionByRange(nOut, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(tmp.toString)
    val f = fs(s, dest)
    f.delete(dest, true)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(s"compactTable: rename $tmp -> $dest failed")
    (before.size, dataFiles(s, path).size)
  }
}
