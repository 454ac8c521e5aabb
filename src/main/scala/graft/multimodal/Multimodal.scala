package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded partition-locally.
  *
  * This container has no media libraries, so the *decode step is a
  * deterministic STUB* (arithmetic on the payload bytes — see
  * `stubDecode`); everything around it is the real thing a 100 TB
  * pipeline needs: a binary payload column, a typed output schema, a
  * partition-local batched iterator (`mapPartitions` — one decoder
  * context per partition, not per row, which is how a real codec/model
  * handle would be amortized), and downstream relational ops over the
  * extracted metadata. Payloads are synthesized from `documents.text`
  * bytes since the testdata has no binary table.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, byte_len: Long,
      sha16: String, width: Long, height: Long, n_frames: Long)

  /** The media table: binary payload + modality tag (deterministic by id). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"))

  /** STUB decoder — stands in for image decode / audio feature extraction.
    * Deliberately pure arithmetic on payload bytes so the full pipeline is
    * still oracle-checkable; a real deployment swaps only this function's
    * body for a codec call. md5 here matches SQL md5 over the same bytes. */
  private def stubDecode(r: MediaRecord): MediaMeta = {
    val len = r.payload.length.toLong
    // thread-local digest: per-partition amortization, not per-record
    val sha16 = graft.plans.HashUtil.md5Hex(r.payload).substring(0, 16)
    MediaMeta(r.doc_id, r.kind, len, sha16,
      width = len % 640, height = len % 480,
      n_frames = if (r.kind == "video") len % 100 else 0L)
  }

  /** Decode metadata for every payload: partition-local batched map. */
  def decodeMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord]
      .mapPartitions { it =>
        // one decoder context per partition (amortized in a real codec)
        it.map(stubDecode)
      }
      .toDF()
  }

  /** Per-payload metadata, relationally queryable. */
  def mmPayloadMeta(s: SparkSession, dir: String): DataFrame =
    decodeMeta(s, dir)
      .select(col("doc_id"), col("kind"), col("byte_len"), col("sha16"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))

  /** Frame sampling: every 10th frame index of each video payload —
    * the explode-over-media-structure pattern (same Catalyst generator as
    * interval expansion). */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    decodeMeta(s, dir)
      .filter(col("kind") === "video" && col("n_frames") >= 1)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(10L))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  final case class MediaFeatures(doc_id: Long, kind: String, features: Array[Double])

  /** STUB feature extractor — stands in for an image/audio embedding
    * model. Deterministic arithmetic over the payload (so the pipeline
    * stays oracle-checkable); a real deployment swaps the body for a
    * model forward pass. Shape matters and is real: batched
    * partition-local iteration producing a fixed-width vector column that
    * downstream similarity ops (Similarity.scala) consume directly. */
  private def stubFeatures(r: MediaRecord): MediaFeatures = {
    val len = r.payload.length.toDouble
    MediaFeatures(r.doc_id, r.kind, Array(
      len / 255.0,
      (r.payload.length % 7).toDouble / 7.0,
      (r.payload.length % 640).toDouble / 640.0,
      (r.payload.length % 480).toDouble / 480.0))
  }

  /** Per-payload feature vectors (array<double>), partition-local batch.
    * The verified query flattens the vector to scalar columns (f0..f3):
    * the driver's row-hash compare sorts column values in pandas, which
    * cannot order raw array cells. Downstream vector consumers use
    * [[featureVectors]] for the array<double> form. */
  def featureVectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRecord]
      .mapPartitions(_.map(stubFeatures))
      .toDF()
      .select(col("doc_id"), col("kind"), col("features"))
  }

  def mmFeatureExtract(s: SparkSession, dir: String): DataFrame =
    featureVectors(s, dir)
      .select(col("doc_id"), col("kind"),
        col("features").getItem(0).as("f0"), col("features").getItem(1).as("f1"),
        col("features").getItem(2).as("f2"), col("features").getItem(3).as("f3"))
      .orderBy(col("doc_id"))

  /** Query stride + k for the feature-similarity composition. */
  val annQueryStride = 20
  val annTopK = 3

  /** The multimodal→similarity composition end-to-end: extracted feature
    * vectors flow straight into cosine top-k (same codegen'd `vec_dot` +
    * broadcast-queries shape as `sim_topk_bruteforce`) — image payloads
    * querying the whole media corpus for nearest neighbors by content
    * features. Zero-norm vectors (empty payloads) are excluded exactly
    * like `Similarity.normed`. Deterministic stub features keep even this
    * cross-modality pipeline oracle-checkable. */
  def mmFeatureAnn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.plans.VectorFunctions.vec_dot(a, b)
    val n = featureVectors(s, dir)
      .withColumn("nrm", sqrt(dot(col("features"), col("features"))))
      .filter(col("nrm") > 0)
    val q = n.filter(col("kind") === "image" && col("doc_id") % annQueryStride === 0)
      .select(col("doc_id").as("q_id"), col("features").as("q_f"), col("nrm").as("q_nrm"))
    val c = n.select(col("doc_id").as("cand_id"), col("features").as("c_f"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("cand_id"))
    c.join(broadcast(q), col("cand_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("q_f"), col("c_f")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= annTopK)
      .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("q_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_payload_meta" -> mmPayloadMeta _,
    "mm_frame_sample" -> mmFrameSample _,
    "mm_feature_extract" -> mmFeatureExtract _,
    "mm_feature_ann" -> mmFeatureAnn _,
  )

  private val kindSql =
    """CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"""

  val oracles: Map[String, String] = Map(
    "mm_payload_meta" ->
      s"""SELECT doc_id, $kindSql AS kind,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |  substr(md5(text), 1, 16) AS sha16,
         |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
         |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
         |  CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 100 ELSE 0 END AS BIGINT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""SELECT doc_id, unnest(range(0, octet_length(encode(text)) % 100, 10)) AS frame_idx
         |FROM documents
         |WHERE doc_id % 3 = 2 AND octet_length(encode(text)) % 100 >= 1
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_feature_extract" ->
      s"""SELECT doc_id, $kindSql AS kind,
         |  CAST(octet_length(encode(text)) AS DOUBLE) / 255.0 AS f0,
         |  CAST(octet_length(encode(text)) % 7 AS DOUBLE) / 7.0 AS f1,
         |  CAST(octet_length(encode(text)) % 640 AS DOUBLE) / 640.0 AS f2,
         |  CAST(octet_length(encode(text)) % 480 AS DOUBLE) / 480.0 AS f3
         |FROM documents ORDER BY doc_id""".stripMargin,
    // left-assoc + and 0+x==x keep the 4-term dot/norm bit-identical to
    // the codegen'd left-fold vec_dot
    "mm_feature_ann" ->
      s"""WITH f AS (
         |  SELECT doc_id, $kindSql AS kind,
         |    CAST(octet_length(encode(text)) AS DOUBLE) / 255.0 AS f0,
         |    CAST(octet_length(encode(text)) % 7 AS DOUBLE) / 7.0 AS f1,
         |    CAST(octet_length(encode(text)) % 640 AS DOUBLE) / 640.0 AS f2,
         |    CAST(octet_length(encode(text)) % 480 AS DOUBLE) / 480.0 AS f3
         |  FROM documents),
         |n AS (SELECT * FROM (
         |    SELECT *, sqrt(f0*f0 + f1*f1 + f2*f2 + f3*f3) AS nrm FROM f)
         |  WHERE nrm > 0),
         |q AS (SELECT * FROM n WHERE kind = 'image' AND doc_id % $annQueryStride = 0),
         |scored AS (
         |  SELECT q.doc_id AS q_id, c.doc_id AS cand_id,
         |    (q.f0*c.f0 + q.f1*c.f1 + q.f2*c.f2 + q.f3*c.f3) / (q.nrm * c.nrm) AS cosine
         |  FROM q JOIN n c ON c.doc_id <> q.doc_id),
         |ranked AS (
         |  SELECT q_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rk
         |  FROM scored)
         |SELECT q_id, rk, cand_id, cosine FROM ranked WHERE rk <= $annTopK
         |ORDER BY q_id, rk""".stripMargin,
  )
}
