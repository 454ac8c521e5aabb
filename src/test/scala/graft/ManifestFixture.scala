package graft

import org.apache.spark.sql.SparkSession

/** Shared corpus for the ingest-time-manifest specs: every manifest
  * reason is planted once, and the dup groups are RESIDUE-ALIGNED
  * (all members of a group share doc_id % 3, lower id first) so the
  * streaming keep-first survivor equals the batch capstone's min-id
  * canonical/representative — the construction that makes exact
  * batch-vs-ingest agreement well-defined. PII-free, so the ingest
  * path's scrub is the identity and scores match the batch side's
  * raw-text scoring bit for bit. */
object ManifestFixture {

  /** 10-token run shared between eval doc 0 and train doc 9 — three
    * 8-shingles, so the planted n_shared is exactly 3. */
  private val sharedRun = (0 until 10).map(w => s"shared$w").mkString(" ")

  private def uniq(tag: String): String =
    (0 until 70).map(w => s"$tag$w").mkString(" ")

  def text(i: Long): String = i match {
    case 0 => s"$sharedRun ${(0 until 60).map(w => s"e0x$w").mkString(" ")}" // eval
    case 9 => s"$sharedRun ${(0 until 60).map(w => s"w9x$w").mkString(" ")}" // contaminated
    case 4 | 7 => uniq("tw4x") // exact twins, both % 3 == 1, 4 first
    case 10 => (0 until 69).map(w => s"nd$w").mkString(" ") + " ndlastA"
    case 13 => (0 until 69).map(w => s"nd$w").mkString(" ") + " ndlastB" // near of 10
    case 14 => "b b b" // low quality
    case i => uniq(s"w${i}x") // 8 is heldout (md5 bucket 93); rest train
  }

  val ids: Seq[Long] = 0L to 14L

  /** reason per TRAIN-side doc (doc 0 is the eval slice — not landed). */
  val expected: Map[Long, String] = Map(
    1L -> "train", 2L -> "train", 3L -> "train", 4L -> "train",
    5L -> "train", 6L -> "train", 7L -> "dup_exact", 8L -> "heldout",
    9L -> "contaminated", 10L -> "train", 11L -> "train", 12L -> "train",
    13L -> "near_dup", 14L -> "low_quality")

  /** Write the corpus as a `documents.parquet` table under a fresh temp
    * dir (the path shape `Tables` and the registered queries read). */
  def corpusDir(spark: SparkSession): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-manifest-fix").toString
    ids.map(i => (i, text(i))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    root
  }
}
