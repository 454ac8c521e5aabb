package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Similarity}

/** Streaming ANN ingest — the VECTOR twin of [[IngestDedup]]: embedding
  * batches land as files, each micro-batch is hashed with the persisted
  * index's FROZEN thresholds (the append semantic — re-centering would
  * re-bucket the standing corpus) and folded into the bucket table, so
  * the ANN index grows continuously as the corpus is embedded — no
  * rebuild, no re-read of standing vectors (the batch pays only its own
  * hashing; the index append is ~12 B/vector/table).
  *
  * The quantizer-training corpus and the served corpus therefore
  * DIVERGE over time — which is the production reality (FAISS/SPANN
  * deployments retrain on drift, not per batch), and exactly what the
  * registered replay measures: thresholds trained on the SEED slice,
  * buckets over everything. That split is also what keeps the whole
  * path DuckDB-oracle-able: the oracle restates the threshold average
  * over the seed slice and the bucket assignment over the full corpus.
  *
  * Retries are value-idempotent: each batch left-anti-joins the bucket
  * table's standing vec_ids before hashing, so a re-delivered file
  * appends nothing (a doubled bucket row would double-score its vector
  * in every probed cell). Compaction runs on the [[IngestDedup.ingestCompactEvery]]
  * cadence inside the loop, same as the dedup ingest.
  */
object AnnIngest {

  /** Drive the landing stream: one embedding file per micro-batch,
    * oldest first, each appended to the persisted LSH index at
    * `indexDir` (seeded by [[AnnIndex.lshIndexWrite]] over the standing
    * corpus). */
  def streamAnnIngestToFiles(s: SparkSession, landingDir: String, indexDir: String,
      checkpointDir: String): Unit =
    IngestDedup.runLandingStream(s, landingDir, checkpointDir,
      batchId => if ((batchId + 1) % IngestDedup.ingestCompactEvery == 0)
        AnnIndex.lshIndexCompact(s, indexDir)) { (batch, _) =>
      val fresh = batch.join(
        s.read.parquet(s"$indexDir/buckets").select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      AnnIndex.lshIndexAppendBatch(s, fresh, indexDir)
    }

  /** IVF twin: each landed batch is assigned to the persisted, frozen
    * centroids and folded into the inverted-list table — same loop,
    * same redelivery anti-join, same compaction cadence. Library API +
    * spec (the trained quantizer makes a registered form rows-only;
    * the LSH form above carries the oracle for the pattern). */
  def streamIvfIngestToFiles(s: SparkSession, landingDir: String, indexDir: String,
      checkpointDir: String): Unit =
    IngestDedup.runLandingStream(s, landingDir, checkpointDir,
      batchId => if ((batchId + 1) % IngestDedup.ingestCompactEvery == 0)
        AnnIndex.ivfIndexCompact(s, indexDir)) { (batch, _) =>
      val fresh = batch.join(
        s.read.parquet(s"$indexDir/lists").select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_anti")
      AnnIndex.ivfIndexAppendBatch(s, fresh, indexDir)
    }

  /** Registered-query replay: seed the index from the modulo-0 slice
    * (the "standing corpus" the thresholds are trained on), stream the
    * remaining slices in as landing files, then serve the stride query
    * set from the grown index — every vector is a candidate, hashed
    * with the seed-trained thresholds. Fresh temp dirs per invocation. */
  def streamAnnIngest(s: SparkSession, dir: String): DataFrame = {
    val emb = graft.Tables(s, dir, "embeddings")
    val root = IngestDedup.stageLanding(s, emb,
        batches = 1 until IngestDedup.ingestBatches, idCol = "vec_id") { root =>
      emb.filter(pmod(col("vec_id"), lit(IngestDedup.ingestBatches.toLong)) === 0)
        .write.mode("overwrite").parquet(s"$root/seed/embeddings.parquet")
      AnnIndex.lshIndexWrite(s, s"$root/seed", s"$root/index")
    }
    streamAnnIngestToFiles(s, s"$root/landing/flat", s"$root/index", s"$root/checkpoint")
    AnnIndex.lshIndexServe(s, s"$root/index", Seq(dir),
      Similarity.normed(s, dir)
        .filter(col("vec_id") % Similarity.queryStride === 0)
        .select(col("vec_id").as("q_id"), col("embedding")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_ann_ingest" -> streamAnnIngest _
  )

  val oracles: Map[String, String] = Map(
    // the LSH oracle with the threshold average restricted to the seed
    // slice — buckets/probes/scoring over the full corpus are unchanged
    "stream_ann_ingest" -> Similarity.lshAnnOracleSqlSeedThr(
      s"vec_id % ${IngestDedup.ingestBatches} = 0")
  )
}
