package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Curation, IndexMaintenance}

/** Streaming eval-set ingest: the grown contamination index serves
  * bit-identically to the in-session two-tier check, redelivery folds
  * nothing twice, and retracting the streamed eval docs rolls the
  * verdicts back to the seed's. */
class DecontamIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  test("streaming eval ingest: grown index == in-session serve; redelivery appends nothing; retraction rolls back") {
    val dir = sf0001
    val r = java.nio.file.Files.createTempDirectory("decontam-ingest-spec").toString
    val eval = Tables(spark, dir, "documents")
      .filter(col("doc_id") % Curation.evalStride === 0)
    // seed = mod-0 third of the eval slice; land the other two thirds
    eval.filter(pmod(col("doc_id"), lit(3)) === 0)
      .write.mode("overwrite").parquet(s"$r/seed/documents.parquet")
    Curation.decontamBloomWrite(spark, s"$r/seed", s"$r/index")
    Curation.decontamShingleWrite(spark, s"$r/seed", s"$r/index")
    val streamedIds = new scala.collection.mutable.ArrayBuffer[Long]()
    (1 to 2).foreach { b =>
      val slice = eval.filter(pmod(col("doc_id"), lit(3)) === b)
      streamedIds ++= slice.select(col("doc_id")).collect().map(_.getLong(0))
      val tmp = s"$r/stage_$b"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$r/landing"))
      new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$r/landing/batch_$b.parquet"))
        new java.io.File(s"$r/landing/batch_$b.parquet")
          .setLastModified(1600000000000L + b * 60000L)
      }
    }
    graft.streaming.DecontamIngest.streamDecontamIngestToFiles(spark, s"$r/landing",
      s"$r/index", s"$r/checkpoint")
    def serveOf(idx: String) = Curation.decontamServeTwoTier(spark, idx, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
    val grown = serveOf(s"$r/index")
    val insession = Curation.decontaminateBloomServed(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
    assert(grown.nonEmpty && grown === insession,
      "grown contamination index diverged from the in-session two-tier check")

    // TRUE redelivery: marker skips the re-presented batch in BOTH tiers
    val before = spark.read.parquet(s"$r/index/eval_shingles").count()
    val bloomBytes = spark.read.parquet(s"$r/index/bloom").head()
      .getAs[Array[Byte]]("bloom").toSeq
    val commits = new java.io.File(s"$r/checkpoint/commits")
      .listFiles().filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toInt)
    new java.io.File(commits.getParentFile, s".${commits.getName}.crc").delete()
    assert(commits.delete(), "could not remove the last commit marker")
    graft.streaming.DecontamIngest.streamDecontamIngestToFiles(spark, s"$r/landing",
      s"$r/index", s"$r/checkpoint")
    assert(spark.read.parquet(s"$r/index/eval_shingles").count() == before,
      "redelivered batch appended duplicate shingle rows")
    assert(spark.read.parquet(s"$r/index/bloom").head()
      .getAs[Array[Byte]]("bloom").toSeq == bloomBytes,
      "redelivered batch re-merged the bloom")
    assert(serveOf(s"$r/index") === grown, "redelivery changed serving")
    IndexMaintenance.checkUnique(spark, s"$r/index/eval_shingles",
      Seq("eval_id", "h"), "eval_id")

    // retracting every STREAMED eval doc rolls verdicts back to the
    // seed-only index's (exact tier immediately; the stale bloom bits
    // are absorbed by the confirm join)
    Curation.decontamIndexDelete(spark, s"$r/index", streamedIds.toSeq)
    Curation.decontamBloomWrite(spark, s"$r/seed", s"$r/seedidx")
    Curation.decontamShingleWrite(spark, s"$r/seed", s"$r/seedidx")
    assert(serveOf(s"$r/index") === serveOf(s"$r/seedidx"),
      "retracting the streamed eval docs did not roll back to the seed verdicts")
  }
}
