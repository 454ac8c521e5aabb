package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths:
  *  - brute-force exact top-k: every (query, candidate) pair scored with
  *    a codegen'd double-precision dot product. The baseline and oracle.
  *    At 100 TB this is only viable per-query-batch with a broadcast of
  *    the query set — which is exactly how it is written (queries are
  *    broadcast; the big candidate side streams, never shuffles).
  *  - LSH-bucketed ANN: 8 deterministic random hyperplanes → 256 buckets;
  *    candidates are scored only within the query's bucket. Sub-linear
  *    candidate sets at scale; recall is checked against brute force in
  *    the test suite.
  *
  * Dot products are left-fold aggregates over zip_with (both engines fold
  * left-to-right in double precision → bit-identical results, so raw
  * doubles are safe to hash-compare).
  */
object Similarity {

  val topK = 5
  val queryStride = 50 // queries = vectors with vec_id % stride == 0

  private def dot(a: Column, b: Column): Column =
    graft.plans.VectorFunctions.vec_dot(a, b)

  private[ops] def normed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      // zero vectors have no direction: cosine would be NaN, and Spark and
      // DuckDB order NaN differently — excluded identically in the oracle
      .filter(col("nrm") > 0)

  /** Exact top-k cosine neighbors for the query subset. */
  def simTopkBruteforce(s: SparkSession, dir: String): DataFrame = {
    val n = normed(s, dir)
    val q = n.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val c = n.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("cand_id"))
    c.join(broadcast(q), col("cand_id") =!= col("q_id"))
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Multi-table hyperplane LSH: `lshTables` independent tables of
    * `lshBits` hyperplanes each (fixed seed → same plan every run;
    * regenerated identically in the recall test). One table of many bits
    * has near-zero recall on weakly-correlated vectors; unioning
    * candidates across several coarse tables is the standard fix —
    * candidates/query ≈ tables · N/2^bits, tunable independently of
    * recall. */
  val lshTables = 4
  val lshBits = 4
  lazy val hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(lshTables * lshBits, 64)(rnd.nextGaussian())
  }

  /** Array of `lshTables` bucket ids (one per table) for an embedding. */
  private def bucketsCol(emb: Column): Column =
    array((0 until lshTables).map { t =>
      (0 until lshBits).map { b =>
        val hLit = array(hyperplanes(t * lshBits + b).map(lit): _*)
        when(graft.plans.VectorFunctions.vec_dot(emb, hLit) > 0, lit(1L << b))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** ANN via multi-table hyperplane LSH: candidates = union over tables of
    * same-bucket vectors; exact rescoring + top-k on candidates only.
    * Rows-only (no SQL oracle — the projections are not SQL-expressible);
    * recall vs brute force is asserted in DedupSimilaritySpec. */
  def simLshAnn(s: SparkSession, dir: String): DataFrame = {
    val buckets = Tables(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(bucketsCol(col("embedding"))).as(Seq("tbl", "bucket")))
    val qb = buckets.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    // dedupe (q, cand) pairs on the narrow id columns BEFORE attaching
    // the 64-float vectors — a pair may collide in several tables, and
    // distinct over embedding arrays would hash the vectors themselves
    val cand = buckets.join(broadcast(qb),
        Seq("tbl", "bucket")).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"))
      .distinct()
    val n = normed(s, dir)
    val q = n.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val c = n.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("cand_id"))
    cand.join(broadcast(q), "q_id").join(c, "cand_id")
      .withColumn("cosine", dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** IVF-style ANN: a deterministic coarse quantizer (centroids = every
    * `centroidStride`-th vector, standing in for k-means output) assigns
    * each vector to its nearest centroid; a query probes its `nProbe`
    * nearest centroids and rescoring runs only inside those inverted
    * lists. Cost per query ≈ nProbe/nCentroids of the corpus instead of
    * all of it. Fully deterministic (argmin with id tie-break), so unlike
    * most IVF builds it is oracle-checkable end-to-end. */
  val centroidStride = 100
  val nProbe = 2

  /** The deterministic coarse quantizer's centroid table (every
    * `centroidStride`-th vector, standing in for k-means output). */
  private[ops] def centroidsOf(n: DataFrame): DataFrame =
    n.filter(col("vec_id") % centroidStride === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))

  /** (id, c_id): each source vector's `keep` nearest centroids by cosine,
    * deterministic (cosine desc, c_id tie-break). Shared by simIvfTopk
    * and Dedup.dedupEmbeddingBlocked — the SAME assignment serves search
    * probes and dedup blocking, so one quantizer build covers both. */
  private[ops] def nearestCentroids(cent: DataFrame)(
      src: DataFrame, idCol: String, embCol: String, nrmCol: String, keep: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("c_cos").desc, col("c_id"))
    src.join(broadcast(cent))
      .withColumn("c_cos", dot(col(embCol), col("c_emb")) / (col(nrmCol) * col("c_nrm")))
      .withColumn("c_rk", row_number().over(w))
      .filter(col("c_rk") <= keep)
      .select(col(idCol), col("c_id"))
  }

  def simIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val n = normed(s, dir)
    val cent = centroidsOf(n)
    val assign = nearestCentroids(cent)(
      n.select(col("vec_id"), col("embedding"), col("nrm")), "vec_id", "embedding", "nrm", 1)
    val q = n.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val probes = nearestCentroids(cent)(q, "q_id", "q_emb", "q_nrm", nProbe)
    val cand = probes.join(assign, "c_id")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"))
      .distinct()
    val c = n.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb2"), col("nrm").as("c_nrm2"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("cand_id"))
    cand.join(broadcast(q), "q_id").join(c, "cand_id")
      .withColumn("cosine", dot(col("q_emb"), col("c_emb2")) / (col("q_nrm") * col("c_nrm2")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("q_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> simTopkBruteforce _,
    "sim_lsh_ann" -> simLshAnn _,
    "sim_ivf_topk" -> simIvfTopk _,
  )

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  val oracles: Map[String, String] = Map(
    "sim_ivf_topk" ->
      s"""WITH n AS (
         |  SELECT * FROM (
         |    SELECT vec_id, embedding,
         |      sqrt(${dotSql("embedding", "embedding")}) AS nrm
         |    FROM embeddings) WHERE nrm > 0),
         |cent AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
         |         FROM n WHERE vec_id % $centroidStride = 1),
         |asgn AS (
         |  SELECT vec_id, c_id FROM (
         |    SELECT v.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${dotSql("v.embedding", "c.c_emb")} / (v.nrm * c.c_nrm) DESC, c.c_id) AS c_rk
         |    FROM n v, cent c)
         |  WHERE c_rk = 1),
         |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
         |      FROM n WHERE vec_id % $queryStride = 0),
         |probes AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q.q_id, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${dotSql("q.q_emb", "c.c_emb")} / (q.q_nrm * c.c_nrm) DESC, c.c_id) AS c_rk
         |    FROM q, cent c)
         |  WHERE c_rk <= $nProbe),
         |cand AS (
         |  SELECT DISTINCT q_id, vec_id AS cand_id
         |  FROM probes JOIN asgn USING (c_id) WHERE vec_id <> q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.cand_id,
         |    ${dotSql("q.q_emb", "c.embedding")} / (q.q_nrm * c.nrm) AS cosine
         |  FROM cand JOIN q ON cand.q_id = q.q_id JOIN n c ON cand.cand_id = c.vec_id),
         |ranked AS (
         |  SELECT q_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rk
         |  FROM scored)
         |SELECT q_id, rk, cand_id, cosine FROM ranked WHERE rk <= $topK
         |ORDER BY q_id, rk""".stripMargin,
    "sim_topk_bruteforce" ->
      s"""WITH n AS (
         |  SELECT * FROM (
         |    SELECT vec_id, embedding,
         |      sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
         |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |    FROM embeddings) WHERE nrm > 0),
         |scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    list_sum(list_transform(range(1, len(q.embedding) + 1),
         |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) / (q.nrm * c.nrm) AS cosine
         |  FROM n q JOIN n c ON q.vec_id % $queryStride = 0 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT q_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, cand_id) AS BIGINT) AS rk
         |  FROM scored)
         |SELECT q_id, rk, cand_id, cosine FROM ranked WHERE rk <= $topK
         |ORDER BY q_id, rk""".stripMargin,
  )
}
