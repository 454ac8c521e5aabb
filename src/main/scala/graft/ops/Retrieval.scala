package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical BM25
  * ranking and a semantic ANN ranking over the SAME document corpus —
  * the standard two-tower retrieval shape a training-data pipeline uses
  * to surface candidate documents ("find docs that either mention the
  * query terms or live near the query embedding"). The testdata's
  * `documents.doc_id` and `embeddings.vec_id` share an id space, which
  * is exactly the deployment layout (one embedding row per document).
  *
  * RRF (Cormack et al.'s rank-fusion rule): score(q, d) = Σ_lists
  * 1/(k + rank_list(q, d)), with k = [[rrfK]] damping the head and
  * absent docs contributing 0. Rank-based fusion needs NO score
  * calibration between the BM25 log-scale and the cosine scale — which
  * is why it is the default fusion in production hybrid search.
  *
  * The whole path is QUERY-SET shaped (round-7 generalization of the
  * single hardcoded query): every stride doc is a hybrid query — its
  * embedding probes the persisted LSH index, and its first
  * [[hybridQueryTerms]] distinct tokens form its lexical query. Scale
  * shape: the semantic side scores only the query set's probed buckets
  * (the [[AnnIndex.lshIndexServe]] path); the lexical side is ONE
  * (term) equi-join of the per-query term table (queries × 3 rows —
  * broadcast) against the per-doc term frequencies (the inverted-index
  * relation — in production the persisted postings, here built in one
  * token-explode pass), then a per-(query, doc) pivot to FIXED term
  * slots so the score sum has a deterministic order. Fusion joins two
  * rank frames of ≤topK rows per query on (q_id, doc_id). No stage
  * touches corpus × queries pairs outside the term/bucket joins. */
object Retrieval {

  /** RRF damping constant (the conventional value from the TREC fusion
    * literature — small enough to prefer agreement over single-list
    * rank-1 hits). */
  val rrfK = 60

  /** Lexical terms drawn per hybrid query: the query doc's first
    * distinct tokens, a deterministic, oracle-able stand-in for a user
    * query string. */
  val hybridQueryTerms = 3

  val hybridTopK = 10

  /** Per-query lexical term slots: (q_id, pos 1..[[hybridQueryTerms]],
    * qt) — first-occurrence-distinct tokens of each stride query doc. */
  private def hybridQueryTermsOf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(col("doc_id") % Similarity.queryStride === 0)
      .select(col("doc_id").as("q_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("q_id"), posexplode(slice(
        filter(col("toks"), (t, i) => array_position(col("toks"), t) === i + 1),
        1, hybridQueryTerms)).as(Seq("pos0", "qt")))
      .select(col("q_id"), (col("pos0") + 1).cast("long").as("pos"), col("qt"))

  /** Per-(query, doc) BM25 over the query-set term table — the grouped
    * generalization of [[TextAnalysis.textBm25Search]]'s fixed query:
    * same k1/b, same 6-decimal score quantization, score summed over
    * the FIXED pos slots so both engines evaluate the identical double
    * expression order. Returns (q_id, doc_id, lex_rk ≤ bm25TopK). */
  private def lexRanks(s: SparkSession, dir: String): DataFrame = {
    val postings = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    lexRanksOver(s, dir, postings)
  }

  /** The lexical tail over an arbitrary (doc_id, term, tf) relation —
    * shared by the in-session scan and the persisted-postings serve.
    * Everything downstream derives from the posting rows alone: dl is
    * the per-doc tf sum (≡ token count — tokenize runs ONCE, and the
    * served form never tokenizes at all), df/n_docs/avgdl follow from
    * the same grouped frame. */
  private def lexRanksOver(s: SparkSession, dir: String, postings: DataFrame,
      bannedTerms: Seq[String] = Seq.empty): DataFrame = {
    // dl/avgdl/df are WHOLE-CORPUS statistics and never shrink under
    // the df-share bound — only the scoring join excludes the banned
    // head, so a stopword slot contributes 0 without re-shaping every
    // other term's score (frozen-statistics serving, as in the bounded
    // BM25 form)
    val doclen = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    val dfr = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val scoring =
      if (bannedTerms.isEmpty) postings
      else postings.filter(!col("term").isin(bannedTerms: _*))
    val slots = 1 to hybridQueryTerms
    val pivots = slots.flatMap { i =>
      Seq(sum(when(col("pos") === i, col("tf"))).as(s"tf_$i"),
        max(when(col("pos") === i, col("df"))).as(s"df_$i"))
    }
    val piv = hybridQueryTermsOf(s, dir)
      .join(scoring, col("qt") === col("term"))
      .join(dfr, "term")
      .groupBy(col("q_id"), col("doc_id"))
      .agg(pivots.head, pivots.tail: _*)
    val contrib = slots.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - col(s"df_$i").cast("double") + 0.5) /
          (col(s"df_$i").cast("double") + 0.5))
      val tf = col(s"tf_$i").cast("double")
      coalesce(idf * (tf * lit(TextAnalysis.bm25K1 + 1.0)) /
        (tf + lit(TextAnalysis.bm25K1) * (lit(1.0 - TextAnalysis.bm25B) +
          lit(TextAnalysis.bm25B) * col("dl").cast("double") / col("avgdl"))),
        lit(0.0))
    }
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    piv
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", round(contrib.reduce(_ + _), 6))
      .withColumn("lex_rk", row_number().over(w).cast("long"))
      .filter(col("lex_rk") <= TextAnalysis.bm25TopK)
      .select(col("q_id"), col("doc_id"), col("lex_rk"))
  }

  /** Fused ranking over the stride query set: q_id, per-query fused
    * rank, doc_id, the two per-list ranks (null when the doc is absent
    * from that list), and the RRF score. Exact over both input
    * rankings, so it carries a full DuckDB oracle composed from the LSH
    * oracle CTE chain and the grouped-BM25 restatement. */
  def searchHybridRrf(s: SparkSession, dir: String): DataFrame =
    fuse(s, dir, lexRanks(s, dir))

  /** The BOUNDED served hybrid as a registered, oracled query:
    * [[searchHybridRrfServed]] with the df-share cut at
    * [[TextAnalysis.bm25MaxDfShare]], plus per-query-slot `act_i` flags
    * (1 = the slot's term survives the bound, 0 = banned stopword head,
    * its lexical contribution zeroed) — the same visible-contract
    * pattern as `text_bm25_served_bounded`, extended to the hybrid's
    * dynamic per-query terms. The flags come from the SAME persisted
    * term dictionary the serve's anti-filter reads, and the oracle
    * recomputes both the cut and the flags from corpus statistics. */
  def searchHybridRrfServedBounded(s: SparkSession, dir: String): DataFrame = {
    val idxDir = TextAnalysis.textIndexFor(s, dir)
    val banned = TextAnalysis.bannedTerms(s, idxDir, TextAnalysis.bm25MaxDfShare)
    val fused = searchHybridRrfServed(s, dir, Some(TextAnalysis.bm25MaxDfShare))
    val actCols = (1 to hybridQueryTerms).map { i =>
      max(when(col("pos") === i,
        when(if (banned.isEmpty) lit(false) else col("qt").isin(banned: _*), 0L)
          .otherwise(1L))).as(s"act_$i")
    }
    val acts = hybridQueryTermsOf(s, dir)
      .groupBy(col("q_id")).agg(actCols.head, actCols.tail: _*)
    fused.join(broadcast(acts), Seq("q_id"), "left")
      .select(col("q_id") +: col("rk") +: col("doc_id") +: col("lex_rk") +:
        col("sem_rk") +: col("rrf") +:
        (1 to hybridQueryTerms).map(i => coalesce(col(s"act_$i"), lit(1L)).as(s"act_$i")): _*)
      .orderBy(col("q_id"), col("rk"))
  }

  /** SERVED hybrid retrieval: the lexical side reads the PERSISTED
    * posting table (the shared text-index memo — same artifact the
    * BM25/phrase serving family reads) instead of re-tokenizing the
    * corpus; tombstoned docs are filtered like every index read. The
    * posting rows are the identical (doc_id, term, tf) integers the
    * scan derives, so the served form shares the scan form's oracle
    * and is byte-identical to it (pinned in `OperatorSpec`). At corpus
    * scale this is the difference between one tokenize pass per query
    * set and none. */
  def searchHybridRrfServed(s: SparkSession, dir: String,
      maxDfShare: Option[Double] = None): DataFrame = {
    val idxDir = TextAnalysis.textIndexFor(s, dir)
    // BOUNDED form: the hybrid's query terms are dynamic (per-query
    // slots), so the mega-posting guard is an anti-filter against the
    // term dictionary's banned head rather than a positive pushed IN —
    // a stopword slot contributes 0 instead of dragging an O(corpus)
    // posting list through the per-(query, doc) pivot join. Zipf keeps
    // the banned list a broadcast-sized literal.
    val postings = IndexMaintenance.minusTombstones(s, s"$idxDir/postings",
        s.read.parquet(s"$idxDir/postings"), "doc_id")
      .select(col("doc_id"), col("term"), col("tf"))
    val banned = maxDfShare.fold(Seq.empty[String])(TextAnalysis.bannedTerms(s, idxDir, _))
    fuse(s, dir, lexRanksOver(s, dir, postings, banned))
  }

  /** The fusion tail shared by the scan and served forms. */
  private def fuse(s: SparkSession, dir: String, lex: DataFrame): DataFrame = {
    val sem = AnnIndex.lshIndexServe(s, AnnIndex.lshIndexFor(s, dir), Seq(dir),
        Similarity.normed(s, dir)
          .filter(col("vec_id") % Similarity.queryStride === 0)
          .select(col("vec_id").as("q_id"), col("embedding")))
      .select(col("q_id"), col("cand_id").as("doc_id"), col("rk").as("sem_rk"))
    // fixed-order fusion sum (lex term + sem term), absent list -> 0.0:
    // both engines evaluate the identical double expression
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("doc_id"))
    lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rk")), lit(0.0)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= hybridTopK)
      .select(col("q_id"), col("rk"), col("doc_id"),
        col("lex_rk"), col("sem_rk"), col("rrf"))
      .orderBy(col("q_id"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_hybrid_rrf" -> searchHybridRrf _,
    "search_hybrid_rrf_served" -> ((s: org.apache.spark.sql.SparkSession, d: String) => searchHybridRrfServed(s, d)),
    "search_hybrid_rrf_served_bounded" -> (searchHybridRrfServedBounded _)
  )

  private val tokSql =
    graft.functions.TextFns.duckTokSql

  val oracles: Map[String, String] = Map(
    // the served form reads identical (doc_id, term, tf) integers from
    // the persisted postings, so it shares the scan form's oracle
    "search_hybrid_rrf_served" -> hybridOracleSql,
    // semantic side: the LSH chain's `ranked` over the full stride set;
    // lexical side: the grouped BM25 restated with the same fixed-slot
    // pivot and 6-decimal quantization; fusion per (q_id, doc_id)
    "search_hybrid_rrf" -> hybridOracleSql,
    // bounded form: the df-share cut restated as a banned-term anti
    // filter on the scoring postings, per-slot act flags recomputed
    // from the same corpus statistics
    "search_hybrid_rrf_served_bounded" ->
      hybridOracleSqlOf(Some(TextAnalysis.bm25MaxDfShare))
  )

  private lazy val hybridOracleSql: String = hybridOracleSqlOf(None)

  private def hybridOracleSqlOf(bound: Option[Double]): String = {
      val k1 = TextAnalysis.bm25K1
      val b = TextAnalysis.bm25B
      val slots = 1 to hybridQueryTerms
      val pivotCols = slots.map { i =>
        s"""    sum(CASE WHEN pos = $i THEN tf END) AS tf_$i,
           |    max(CASE WHEN pos = $i THEN df END) AS df_$i""".stripMargin
      }.mkString(",\n")
      val contribSql = slots.map { i =>
        s"""COALESCE(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5)
           |      / (CAST(df_$i AS DOUBLE) + 0.5))
           |    * (CAST(tf_$i AS DOUBLE) * ${k1 + 1.0})
           |    / (CAST(tf_$i AS DOUBLE) + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) / avgdl)), 0.0)""".stripMargin
      }.mkString("\n    + ")
      val bannedCte = bound.fold("") { share =>
        s"""banned AS (
           |  SELECT term FROM dfr CROSS JOIN lstats
           |  WHERE CAST(df AS DOUBLE) > $share * CAST(n_docs AS DOUBLE)),
           |""".stripMargin
      }
      // the scoring postings: anti-filtered against the banned head in
      // the bounded form, the plain posting rows otherwise — dl, df,
      // and the global stats always aggregate the UNFILTERED corpus
      // (frozen-statistics serving, as in the code path)
      val spostCte = bound.fold("spost AS (SELECT * FROM post)")( _ =>
        "spost AS (SELECT * FROM post WHERE term NOT IN (SELECT term FROM banned))")
      val actsCte = bound.fold("") { _ =>
        val cols = (1 to hybridQueryTerms).map(i =>
          s"    max(CASE WHEN pos = $i THEN (CASE WHEN qt IN (SELECT term FROM banned) " +
          s"THEN 0 ELSE 1 END) END) AS act_$i").mkString(",\n")
        s""",
           |acts AS (
           |  SELECT q_id,
           |$cols
           |  FROM qt GROUP BY q_id)""".stripMargin
      }
      val finalSelect = bound.fold(
        s"""SELECT q_id, rk, doc_id, lex_rk, sem_rk, rrf FROM (
           |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk
           |  FROM fused)
           |WHERE rk <= $hybridTopK
           |ORDER BY q_id, rk""".stripMargin) { _ =>
        val actSel = (1 to hybridQueryTerms)
          .map(i => s"CAST(COALESCE(a.act_$i, 1) AS BIGINT) AS act_$i").mkString(", ")
        s"""SELECT r.q_id, rk, doc_id, lex_rk, sem_rk, rrf, $actSel FROM (
           |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk
           |  FROM fused) r
           |LEFT JOIN acts a ON r.q_id = a.q_id
           |WHERE rk <= $hybridTopK
           |ORDER BY r.q_id, rk""".stripMargin
      }
      s"""WITH ${Similarity.lshAnnOracleCtes("TRUE")},
         |lbase AS (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
         |  FROM (SELECT doc_id, $tokSql AS toks FROM documents)
         |  WHERE len(toks) >= 1),
         |post AS (
         |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM lbase)
         |  GROUP BY doc_id, term),
         |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term),
         |lstats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM lbase),
         |${bannedCte}$spostCte,
         |qtl AS (
         |  SELECT doc_id AS q_id,
         |    list_filter(toks, (t, i) -> list_position(toks, t) = i)[1:$hybridQueryTerms] AS l
         |  FROM lbase WHERE doc_id % ${Similarity.queryStride} = 0),
         |qt AS (
         |  SELECT q_id, pos, l[pos] AS qt FROM (
         |    SELECT q_id, l, unnest(generate_series(1, len(l))) AS pos FROM qtl))$actsCte,
         |piv AS (
         |  SELECT qt.q_id, spost.doc_id,
         |$pivotCols
         |  FROM qt JOIN spost ON spost.term = qt.qt JOIN dfr ON dfr.term = qt.qt
         |  GROUP BY qt.q_id, spost.doc_id),
         |lscored AS (
         |  SELECT q_id, piv.doc_id,
         |    round($contribSql, 6) AS score
         |  FROM piv JOIN lbase ON piv.doc_id = lbase.doc_id CROSS JOIN lstats),
         |lexr AS (
         |  SELECT q_id, doc_id,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rk
         |  FROM lscored
         |  QUALIFY lex_rk <= ${TextAnalysis.bm25TopK}),
         |sem AS (
         |  SELECT q_id, cand_id AS doc_id, rk AS sem_rk FROM ranked
         |  WHERE rk <= ${Similarity.topK}),
         |fused AS (
         |  SELECT COALESCE(lexr.q_id, sem.q_id) AS q_id,
         |    COALESCE(lexr.doc_id, sem.doc_id) AS doc_id,
         |    lexr.lex_rk AS lex_rk, sem.sem_rk AS sem_rk,
         |    COALESCE(1.0 / ($rrfK + lexr.lex_rk), 0.0)
         |      + COALESCE(1.0 / ($rrfK + sem.sem_rk), 0.0) AS rrf
         |  FROM lexr FULL OUTER JOIN sem
         |    ON lexr.q_id = sem.q_id AND lexr.doc_id = sem.doc_id)
         |$finalSelect""".stripMargin
  }
}
