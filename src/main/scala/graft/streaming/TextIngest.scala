package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{IndexMaintenance, TextAnalysis}

/** Streaming LEXICAL-index ingest — the postings twin of [[AnnIngest]]:
  * document batches land as files and each micro-batch is tokenized
  * once and folded into the persisted text index (postings + doc-values
  * appends), so lexical search serves a continuously-growing corpus
  * with no rebuild and no re-read of standing documents. This completes
  * the ingest-loop family: every persisted index this engine serves
  * from (signature, LSH bucket, IVF list, posting) now grows by the
  * same marker-guarded, cadence-compacted append loop.
  *
  * The statistics semantic mirrors the ANN twins' train/serve
  * divergence, but with the lexical engine's own staleness model:
  * per-term df is DERIVED from the postings at query time (always
  * current), while the 1-row n_docs/avgdl stats stay FROZEN at their
  * last rebuild until a compaction recomputes them — Lucene's segment
  * model (commits don't re-estimate global stats; merges do). The
  * registered replay keeps the grown index UNcompacted, so its oracle
  * restates exactly that split: df and ranking over the full corpus,
  * n_docs/avgdl over the seed slice.
  *
  * Retries ride the shared idempotence machinery: per-batch marker
  * probe ([[IndexMaintenance.batchSeen]], O(1) per trigger regardless
  * of index size) plus deterministic per-batch file names
  * ([[IndexMaintenance.appendBatchAs]]) closing the append-vs-marker
  * crash window. The compaction cadence runs the (term, doc_id)
  * uniqueness invariant before each compact — a doc indexed by two
  * DIFFERENT batches is an upstream id-assignment bug surfaced loudly,
  * not silently double-scored.
  */
object TextIngest {

  /** Drive the landing stream: one document file per micro-batch,
    * oldest first, each folded into the persisted text index at
    * `indexDir` (seeded by [[TextAnalysis.textIndexWrite]] over the
    * standing corpus). Every [[IngestDedup.ingestCompactEvery]]-th
    * batch checks the uniqueness invariant and compacts — which is
    * also where n_docs/avgdl catch up with the appended documents. */
  def streamTextIngestToFiles(s: SparkSession, landingDir: String, indexDir: String,
      checkpointDir: String): Unit = {
    val lineage = IndexMaintenance.lineageTag(checkpointDir)
    IngestDedup.runLandingStream(s, landingDir, checkpointDir,
      IngestDedup.alarmCadence(s, Seq(indexDir)) {
        IndexMaintenance.checkUnique(s, s"$indexDir/postings",
          Seq("term", "doc_id"), "doc_id")
        TextAnalysis.textIndexCompact(s, indexDir)
      }) { (batch, batchId) =>
      // one lease + lock acquisition for the whole trigger: the probe,
      // BOTH table appends, and the fold marker are atomic against a
      // concurrent compaction (see textIndexAppendBatch's contract)
      IndexMaintenance.withIndexMaintenance(s, indexDir) {
        if (!IndexMaintenance.batchSeen(s, indexDir, lineage, batchId)) {
          TextAnalysis.textIndexAppendBatch(s, batch, indexDir,
            tag = Some(IndexMaintenance.batchTag(lineage, batchId)))
          IndexMaintenance.recordBatch(s, indexDir, lineage, batchId)
        }
      }
    }
  }

  /** Registered-query replay: seed the index from the modulo-0 slice
    * (the "standing corpus" whose n_docs/avgdl the stats table holds),
    * stream the remaining slices in as landing files, then run the
    * fixed BM25 query against the GROWN, uncompacted index — every
    * document is a ranking candidate with current df, scored under the
    * seed-frozen global stats. Fresh temp dirs per invocation. */
  def streamTextIngest(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables(s, dir, "documents")
    val root = IngestDedup.stageLanding(s, docs,
        batches = 1 until IngestDedup.ingestBatches) { root =>
      docs.filter(pmod(col("doc_id"), lit(IngestDedup.ingestBatches.toLong)) === 0)
        .write.mode("overwrite").parquet(s"$root/seed/documents.parquet")
      TextAnalysis.textIndexWrite(s, s"$root/seed", s"$root/index")
    }
    streamTextIngestToFiles(s, s"$root/landing/flat", s"$root/index", s"$root/checkpoint")
    TextAnalysis.textBm25Served(s, s"$root/index")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_text_ingest" -> streamTextIngest _
  )

  val oracles: Map[String, String] = Map(
    // df + ranking over the grown (full) corpus; n_docs/avgdl frozen
    // at the seed build — the uncompacted-append staleness semantic
    "stream_text_ingest" -> TextAnalysis.bm25OracleSqlSeedStats(
      s"doc_id % ${IngestDedup.ingestBatches} = 0")
  )
}
