package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.IndexMaintenance

/** Round-9 maintenance hardening:
  *
  *  - cross-process LEASE: a second process's maintenance op fails
  *    LOUDLY against a live foreign lease instead of silently racing
  *    the swap; a stale lease (crashed holder) is broken and re-taken
  *  - file-name SEQUENCE stamps replace mtime tombstone sequencing:
  *    delete-then-re-append serves immediately even when every file
  *    carries the SAME modification time (the coarse-granularity
  *    object-store case the mtime watermark silently lost rows on)
  *  - fold-marker RETIREMENT: the `_batches` sidecar stays bounded at
  *    one marker per checkpoint lineage instead of one per micro-batch
  *    forever
  *  - ABSORBED-batch markers: a rewrite that absorbs an un-markered
  *    batch's files (crash between data append and marker write, then
  *    a compaction/retrain) pins the batch's marker, so the retry
  *    skips instead of re-landing duplicate rows
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def file(p: String) = new java.io.File(p)
  private def tmpDir(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("lease: a live foreign lease fails maintenance loudly; a stale one is broken") {
    import spark.implicits._
    val tmp = tmpDir("lease")
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/t")
    // fabricate a concurrent writer: a foreign-owned lease, fresh mtime
    val lease = file(s"$tmp/.t.lease")
    val out = new java.io.FileOutputStream(lease)
    out.write("00000000-dead-beef-0000-000000000000".getBytes("UTF-8")); out.close()
    val e1 = intercept[IllegalStateException](
      IndexMaintenance.deleteIds(spark, s"$tmp/t", Seq(1L)))
    assert(e1.getMessage.contains("concurrent maintenance writer"))
    val e2 = intercept[IllegalStateException](
      IndexMaintenance.compactTable(spark, s"$tmp/t", Seq("id")))
    assert(e2.getMessage.contains("concurrent maintenance writer"))
    val e3 = intercept[IllegalStateException](
      IndexMaintenance.appendPlain(spark,
        Seq((99L, "x")).toDF("id", "v"), s"$tmp/t"))
    assert(e3.getMessage.contains("concurrent maintenance writer"))
    // the blocked ops left the table untouched
    assert(spark.read.parquet(s"$tmp/t").count() == 50L)
    assert(!file(s"$tmp/t/_tombstones").exists(), "delete landed despite the lease")
    // stale (crashed holder): older than leaseStaleMs -> broken, op runs
    assert(lease.setLastModified(
      System.currentTimeMillis() - IndexMaintenance.leaseStaleMs - 60000L))
    IndexMaintenance.deleteIds(spark, s"$tmp/t", Seq(1L))
    assert(file(s"$tmp/t/_tombstones").exists(), "op did not run after breaking the stale lease")
    assert(!lease.exists() || lease.length() == 0 ||
      new String(java.nio.file.Files.readAllBytes(lease.toPath)) != "00000000-dead-beef-0000-000000000000",
      "stale foreign lease not broken")
    // and the lease is released afterwards: a second op proceeds
    IndexMaintenance.compactTable(spark, s"$tmp/t", Seq("id"), tombstoneCol = Some("id"))
    assert(spark.read.parquet(s"$tmp/t").count() == 49L)
    assert(!file(s"$tmp/.t.lease").exists(), "lease leaked after release")
  }

  test("sequence stamps: delete-then-re-append serves under a coarse-granularity clock") {
    import spark.implicits._
    val tmp = tmpDir("seqstamp")
    (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/t")
    IndexMaintenance.deleteIds(spark, s"$tmp/t", Seq(5L))
    IndexMaintenance.appendPlain(spark, Seq((5L, "re-admitted")).toDF("id", "v"), s"$tmp/t")
    // simulate a second-resolution / mtime-less filesystem: EVERY file
    // in the table carries the identical modification time, so any
    // mtime-derived ordering collapses — the old watermark scheme
    // masked (and at compact physically dropped) the re-append here
    val now = System.currentTimeMillis()
    file(s"$tmp/t").listFiles().filter(_.isFile).foreach(f => assert(f.setLastModified(now)))
    def served() = IndexMaintenance.minusTombstones(spark, s"$tmp/t",
      spark.read.parquet(s"$tmp/t"), "id")
      .filter(col("id") === 5L).collect().map(_.getString(1)).toSeq
    assert(served() === Seq("re-admitted"),
      "re-appended row lost under a flat-mtime file set")
    // compact PHYSICALLY keeps exactly the re-admitted copy
    IndexMaintenance.compactTable(spark, s"$tmp/t", Seq("id"), tombstoneCol = Some("id"))
    assert(spark.read.parquet(s"$tmp/t").filter(col("id") === 5L)
      .collect().map(_.getString(1)).toSeq === Seq("re-admitted"),
      "compaction dropped the re-admitted row (the mtime-granularity data-loss mode)")
    assert(spark.read.parquet(s"$tmp/t").count() == 20L)
  }

  test("marker retirement: the _batches sidecar is bounded per lineage, newest kept") {
    import spark.implicits._
    val tmp = tmpDir("retire")
    (1L to 10L).map(i => (i, i * 2)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/idx/t")
    // 30 replayed batches on one lineage + 3 on an older checkpoint's
    for (b <- 0L until 30L) IndexMaintenance.recordBatch(spark, s"$tmp/idx", "aaaa1111", b)
    for (b <- 0L until 3L) IndexMaintenance.recordBatch(spark, s"$tmp/idx", "bbbb2222", b)
    // filter the local FS's .crc sidecars — java.io.File sees them
    def markers() = file(s"$tmp/idx/_batches").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    assert(markers().size == 33)
    IndexMaintenance.compactTable(spark, s"$tmp/idx/t", Seq("id"),
      markerDir = Some(s"$tmp/idx/_batches"))
    val left = markers()
    assert(left == Set("aaaa1111_b29", "bbbb2222_b2"),
      s"retirement kept $left — want exactly each lineage's max batch id")
    // the survivors still answer batchSeen (the only ids that can retry)
    assert(IndexMaintenance.batchSeen(spark, s"$tmp/idx", "aaaa1111", 29L))
    assert(IndexMaintenance.batchSeen(spark, s"$tmp/idx", "bbbb2222", 2L))
  }

  test("absorbed batch: a rewrite pins the un-markered batch's fold marker (no re-land)") {
    import spark.implicits._
    val tmp = tmpDir("absorb")
    val lineage = "cccc3333"
    (1L to 10L).map(i => (i, i * 2)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/idx/t")
    // batch 0: data landed via the idempotent tagged append, but the
    // crash hit BEFORE recordBatch — no marker
    val tag = IndexMaintenance.batchTag(lineage, 0L)
    IndexMaintenance.appendBatchAs(spark,
      (11L to 15L).map(i => (i, i * 2)).toDF("id", "v"), s"$tmp/idx/t", tag)
    assert(!IndexMaintenance.batchSeen(spark, s"$tmp/idx", lineage, 0L))
    // a compaction rewrites the table: the batch's b$tag files are
    // absorbed into anonymous part files...
    IndexMaintenance.compactTable(spark, s"$tmp/idx/t", Seq("id"),
      markerDir = Some(s"$tmp/idx/_batches"))
    assert(!file(s"$tmp/idx/t").listFiles().exists(_.getName.startsWith(s"b$tag")),
      "compaction should have absorbed the batch files")
    // ...so the marker MUST now exist: the restarted stream's retry
    // consults it and skips, instead of re-landing 5 duplicate rows
    assert(IndexMaintenance.batchSeen(spark, s"$tmp/idx", lineage, 0L),
      "absorbed batch lost its fold marker — the retry would duplicate rows")
    assert(spark.read.parquet(s"$tmp/idx/t").count() == 15L)
    IndexMaintenance.checkUnique(spark, s"$tmp/idx/t", Seq("id"), "id")
  }

  test("absorbed batch: a retrain publish pins the un-markered batch's fold marker") {
    import org.apache.spark.sql.functions.col
    import graft.ops.{AnnIndex, Similarity}
    val tmp = tmpDir("absorb-pub")
    val emb = Tables(spark, TestSpark.sf0001, "embeddings")
    // disjoint seed / landed slices: the landed batch's vectors are NOT
    // in the seed, exactly as in the streaming deployment
    emb.filter(col("vec_id") % 97 =!= 3)
      .write.mode("overwrite").parquet(s"$tmp/corpus/embeddings.parquet")
    AnnIndex.lshIndexWrite(spark, s"$tmp/corpus", s"$tmp/idx")
    // an un-markered landed batch (crash before recordBatch): hash a
    // tiny slice through the batch append with a lineage tag
    val lineage = "dddd4444"
    val batch = emb.filter(col("vec_id") % 97 === 3)
    batch.write.mode("overwrite").parquet(s"$tmp/landed/embeddings.parquet")
    graft.ops.AnnIndex.lshIndexAppendBatch(spark, batch, s"$tmp/idx",
      tag = Some(IndexMaintenance.batchTag(lineage, 4L)))
    assert(!IndexMaintenance.batchSeen(spark, s"$tmp/idx", lineage, 4L))
    // the retrain's rebuild (over the full corpus incl. the landed
    // slice) absorbs the landed rows; publish must pin the marker so a
    // restarted stream's retry skips instead of re-landing
    AnnIndex.lshIndexRetrain(spark, s"$tmp/idx", Seq(s"$tmp/corpus", s"$tmp/landed"))
    assert(IndexMaintenance.batchSeen(spark, s"$tmp/idx", lineage, 4L),
      "retrain publish lost the absorbed batch's fold marker")
  }
}
