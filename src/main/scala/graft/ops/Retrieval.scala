package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
  * ranking and a semantic ANN ranking over the SAME document corpus —
  * the standard two-tower retrieval shape a training-data pipeline uses
  * to surface candidate documents ("find docs that either mention the
  * query terms or live near the query embedding"). The testdata's
  * `documents.doc_id` and `embeddings.vec_id` share an id space, which
  * is exactly the deployment layout (one embedding row per document).
  *
  * RRF (Cormack et al.'s rank-fusion rule): score(d) = Σ_lists
  * 1/(k + rank_list(d)), with k = [[rrfK]] damping the head and absent
  * docs contributing 0. Rank-based fusion needs NO score calibration
  * between the BM25 log-scale and the cosine scale — which is why it is
  * the default fusion in production hybrid search.
  *
  * Scale shape: each side is already its own scale path — BM25 is a
  * linear scan (or the persisted-postings serve), the semantic side
  * serves ONE query from the persisted LSH index (only its probed
  * buckets are scored, not the stride sample's). The fusion itself
  * joins two ≤topK-row frames — driver-trivial at any corpus size. */
object Retrieval {

  /** RRF damping constant (the conventional value from the TREC fusion
    * literature — small enough to prefer agreement over single-list
    * rank-1 hits). */
  val rrfK = 60

  /** The demo hybrid query: terms = [[TextAnalysis.bm25Query]], vector
    * = the embedding of this corpus vector (doc 0's embedding under the
    * shared id space; also a member of the stride query set, so its
    * semantic ranks equal `sim_lsh_ann`'s q_id=0 rows). */
  val hybridQueryId = 0L

  val hybridTopK = 10

  /** Fused ranking: doc_id, the two per-list ranks (null when the doc
    * is absent from that list), and the RRF score. Exact over both
    * input rankings, so it carries a full DuckDB oracle composed from
    * the BM25 and LSH oracle CTEs. */
  def searchHybridRrf(s: SparkSession, dir: String): DataFrame = {
    // semantic side: serve ONE query from the persisted index — probes
    // only that query's buckets (the single-query serving cost), and is
    // byte-identical to sim_lsh_ann's q_id=hybridQueryId rows because
    // per-query results depend only on the query's own probed buckets
    val sem = AnnIndex.lshIndexServe(s, AnnIndex.lshIndexFor(s, dir), Seq(dir),
        Similarity.normed(s, dir)
          .filter(col("vec_id") === hybridQueryId)
          .select(col("vec_id").as("q_id"), col("embedding")))
      .select(col("cand_id").as("doc_id"), col("rk").as("sem_rk"))
    // lexical side: the BM25 top-k re-ranked to dense 1..k (its score
    // order with doc_id tie-break) — a ≤bm25TopK-row window
    val lexW = Window.orderBy(col("score").desc, col("doc_id"))
    val lex = TextAnalysis.textBm25Search(s, dir)
      .select(col("doc_id"), col("score"))
      .withColumn("lex_rk", row_number().over(lexW).cast("long"))
      .select(col("doc_id"), col("lex_rk"))
    // fixed-order fusion sum (lex term + sem term), absent list -> 0.0:
    // both engines evaluate the identical double expression
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rk")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(hybridTopK)
      .select(col("doc_id"), col("lex_rk"), col("sem_rk"), col("rrf"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_hybrid_rrf" -> searchHybridRrf _
  )

  val oracles: Map[String, String] = Map(
    // composed from the two sides' oracle CTE chains: the LSH chain's
    // `ranked` (restricted to the hybrid query) fuses with the BM25
    // ranked select re-ranked dense
    "search_hybrid_rrf" ->
      s"""WITH ${Similarity.lshAnnOracleCtes("TRUE")},
         |${TextAnalysis.bm25OracleCtes},
         |lex AS (${TextAnalysis.bm25RankedSelectSql("TRUE")}),
         |lexr AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rk
         |  FROM lex),
         |sem AS (
         |  SELECT cand_id AS doc_id, rk AS sem_rk FROM ranked
         |  WHERE q_id = $hybridQueryId AND rk <= ${Similarity.topK})
         |SELECT COALESCE(lexr.doc_id, sem.doc_id) AS doc_id,
         |  lexr.lex_rk AS lex_rk, sem.sem_rk AS sem_rk,
         |  COALESCE(1.0 / ($rrfK + lexr.lex_rk), 0.0)
         |    + COALESCE(1.0 / ($rrfK + sem.sem_rk), 0.0) AS rrf
         |FROM lexr FULL OUTER JOIN sem ON lexr.doc_id = sem.doc_id
         |ORDER BY rrf DESC, COALESCE(lexr.doc_id, sem.doc_id) LIMIT $hybridTopK""".stripMargin
  )
}
