package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, IndexMaintenance, Similarity}

/** The promote/publish crash-state machine (round 8): every state a
  * crash can leave behind — discriminated by the intent marker and
  * which atomic renames completed — must heal at the next maintenance
  * op without losing appended batches, acknowledged deletes, or fold
  * markers. Each test FABRICATES a crash state on disk and then runs a
  * normal maintenance call. */
class PromoteRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  private def file(p: String) = new java.io.File(p)

  test("append recreating the table after a crash-between-renames folds in, never deleted") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("promote-f1").toString
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/t")
    // crash state: rewrite staged, intent down, dest renamed aside,
    // promote NOT executed
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/.t.compact.tmp")
    assert(file(s"$tmp/.t.promote.intent").createNewFile())
    assert(file(s"$tmp/t").renameTo(file(s"$tmp/.t.compact.old")))
    // a plain mode("append") writer recreates dest with ONLY its batch —
    // these are real rows; the old recovery treated the aside as a
    // finished promote's garbage and deleted the standing table
    (101L to 110L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("append").parquet(s"$tmp/t")
    IndexMaintenance.compactTable(spark, s"$tmp/t", Seq("id"))
    val ids = spark.read.parquet(s"$tmp/t").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == (1L to 110L).toSet,
      s"recovery lost rows: ${(1L to 110L).toSet -- ids}")
    assert(!file(s"$tmp/.t.compact.old").exists(), "aside left behind")
    assert(!file(s"$tmp/.t.compact.tmp").exists(), "stale rewrite left behind")
    assert(!file(s"$tmp/.t.promote.intent").exists(), "intent left behind")
  }

  test("crash after promote, before the late-delete re-apply: the delete survives recovery") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("promote-f5").toString
    // promoted state: dest IS the rewrite (id 5 physically dropped,
    // consumed snapshot persisted); the aside still holds the old table
    // whose _tombstones carry BOTH the consumed delete and a LATE one
    // (id 7) that landed after the rewrite's snapshot; no tmp; intent on
    (1L to 100L).filter(i => i != 5L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/t")
    Seq((5L, 1234L)).toDF("id", "del_seq")
      .write.mode("overwrite").parquet(s"$tmp/t/_consumed")
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/.t.compact.old")
    Seq((5L, 1234L), (7L, 5678L)).toDF("id", "del_seq")
      .write.mode("overwrite").parquet(s"$tmp/.t.compact.old/_tombstones")
    assert(file(s"$tmp/.t.promote.intent").createNewFile())
    // any maintenance op heals; deleteIds of an unrelated id here
    IndexMaintenance.deleteIds(spark, s"$tmp/t", Seq(99L))
    val served = IndexMaintenance.minusTombstones(spark, s"$tmp/t",
        spark.read.parquet(s"$tmp/t"), "id")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(!served.contains(7L), "late delete lost across the crash — a lost takedown")
    assert(!served.contains(99L) && !served.contains(5L))
    assert(served.contains(6L), "recovery over-masked")
    assert(!file(s"$tmp/.t.compact.old").exists(), "aside left behind")
    assert(!file(s"$tmp/.t.promote.intent").exists(), "intent left behind")
  }

  test("batch retry after a delete keeps the delete: re-landed files carry the first attempt's sequence") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("promote-f4").toString
    (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$tmp/t")
    val batch = (11L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    IndexMaintenance.appendBatchAs(spark, batch, s"$tmp/t", "tag1")
    // takedown lands between the batch's data append and its marker —
    // sequenced against the FIRST attempt's file mtime
    IndexMaintenance.deleteIds(spark, s"$tmp/t", Seq(15L))
    Thread.sleep(20) // ensure a naive retry would land strictly newer
    IndexMaintenance.appendBatchAs(spark, batch, s"$tmp/t", "tag1")
    val served = IndexMaintenance.minusTombstones(spark, s"$tmp/t",
        spark.read.parquet(s"$tmp/t"), "id")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(!served.contains(15L),
      "retried batch re-landed past the tombstone watermark — takedown undone")
    assert(served == ((1L to 20L).toSet - 15L), s"unexpected serve set $served")
  }

  test("retrain publish crash before promote: index and fold markers restore, retrain re-runs") {
    val tmp = java.nio.file.Files.createTempDirectory("publish-f2").toString
    val emb = Tables(spark, sf0001, "embeddings")
    emb.write.mode("overwrite").parquet(s"$tmp/corpus/embeddings.parquet")
    AnnIndex.lshIndexWrite(spark, s"$tmp/corpus", s"$tmp/idx")
    IndexMaintenance.recordBatch(spark, s"$tmp/idx", "aa", 0L)
    // crash state: _batches carried into the rebuild, dest renamed
    // aside, promote NOT executed — the old publish left the index
    // bricked here (nothing knew the .retrain.old suffix)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/.idx.retrain.tmp"))
    assert(file(s"$tmp/idx/_batches").renameTo(file(s"$tmp/.idx.retrain.tmp/_batches")))
    assert(file(s"$tmp/.idx.publish.intent").createNewFile())
    assert(file(s"$tmp/idx").renameTo(file(s"$tmp/.idx.retrain.old")))
    // the next retrain heals first, then retrains normally
    AnnIndex.lshIndexRetrain(spark, s"$tmp/idx", Seq(s"$tmp/corpus"))
    assert(IndexMaintenance.batchSeen(spark, s"$tmp/idx", "aa", 0L),
      "fold marker lost across the crash — redelivery would double-fold")
    assert(!file(s"$tmp/.idx.retrain.old").exists() &&
      !file(s"$tmp/.idx.retrain.tmp").exists() &&
      !file(s"$tmp/.idx.publish.intent").exists(), "crash debris left behind")
    val q = Similarity.normed(spark, s"$tmp/corpus")
      .filter(col("vec_id") % 9 === 1)
      .select(col("vec_id").as("q_id"), col("embedding"))
    assert(AnnIndex.lshIndexServe(spark, s"$tmp/idx", Seq(s"$tmp/corpus"), q)
      .count() > 0, "recovered+retrained index does not serve")
  }

  test("retrain publish crash after promote: a delete that raced the retrain survives") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("publish-f3").toString
    val emb = Tables(spark, sf0001, "embeddings")
    emb.write.mode("overwrite").parquet(s"$tmp/corpus/embeddings.parquet")
    AnnIndex.lshIndexWrite(spark, s"$tmp/corpus", s"$tmp/idx")
    val victim = spark.read.parquet(s"$tmp/idx/buckets")
      .select(col("vec_id")).distinct().head().getLong(0)
    // promoted state: dest is the rebuilt index (empty consumed
    // snapshot), the aside holds the pre-retrain index whose tombstones
    // carry a delete issued DURING the retrain; no tmp; intent on
    Seq.empty[(Long, Long)].toDF("id", "del_seq")
      .write.mode("overwrite").parquet(s"$tmp/idx/buckets/_consumed")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/.idx.retrain.old"))
    Seq((victim, 1L)).toDF("id", "del_seq")
      .write.mode("overwrite").parquet(s"$tmp/.idx.retrain.old/buckets/_tombstones")
    assert(file(s"$tmp/.idx.publish.intent").createNewFile())
    IndexMaintenance.recoverPublish(spark, s"$tmp/idx", "buckets")
    val served = IndexMaintenance.minusTombstones(spark, s"$tmp/idx/buckets",
        spark.read.parquet(s"$tmp/idx/buckets"), "vec_id")
      .select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(!served.contains(victim),
      "delete racing the retrain was discarded — a lost takedown")
    assert(!file(s"$tmp/.idx.retrain.old").exists() &&
      !file(s"$tmp/.idx.publish.intent").exists(), "crash debris left behind")
  }
}
