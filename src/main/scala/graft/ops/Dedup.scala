package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Deduplication operators over `documents` / `embeddings` — the core of
  * a training-data pipeline at 100 TB. Five strategies, cheapest first:
  *
  *  - exact:       one hash-groupBy on the content (or its md5) — single
  *                 shuffle, linear.
  *  - MinHash+LSH: shingle → K minhashes → band signatures → bucket join.
  *                 Candidate generation never compares all pairs: the join
  *                 key is (band, signature), so cost is bucket-local. The
  *                 quadratic exact-Jaccard verify runs only on candidates.
  *  - SimHash:     one 32-bit signature per doc, byte-band blocking, then
  *                 Hamming distance on candidates (bit_count(xor)).
  *  - n-gram Jaccard: exact pairwise verify via shingle-equality join —
  *                 the ground-truth oracle for the two above; at scale it
  *                 is only ever run AFTER LSH blocking.
  *  - embedding cosine: exact near-dup detection in embedding space;
  *                 the blocked/ANN variant lives in Similarity.
  *
  * The minhash parameters and simhash bit table are Scala constants,
  * and the DuckDB oracle SQL is *generated from the same constants*, so
  * both engines compute identical integer math end-to-end (md5-derived
  * 32-bit hashes, exact integer min-hashing — no floating point anywhere
  * in the signatures).
  */
object Dedup {

  /** MinHash universal-hash params (j, a, b): h_j(x) = (a*x + b) mod P.
    * a < 2^17 keeps a*md5Int(x) < 2^49 — no int64 overflow. */
  val P = 2147483647L
  val mhParams: Seq[(Int, Long, Long)] =
    Seq(100003L, 100019L, 100043L, 100049L, 100057L, 100069L, 100103L, 100109L,
      100129L, 100151L, 100153L, 100169L, 100183L, 100189L, 100193L, 100207L)
      .zipWithIndex.map { case (a, j) => (j, a, 7919L * j + 13) }
  val mhBands = 4 // 16 hashes = 4 bands × 4 rows

  val jaccardThreshold = 0.7
  val hammingThreshold = 6
  val cosineThreshold = 0.45

  /** (doc_id, shingle) — distinct 3-gram shingles per document. */
  private def shingleDf(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(TextFns.shingles(TextFns.tokens(col("text")), 3)).as("shingle"))

  private val tokSql = """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
  private val shingleSql =
    s"""SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 1),
       |    i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
       |  FROM (SELECT doc_id, $tokSql AS tk FROM documents)""".stripMargin
  private val md5IntSql = "CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT)"

  /** Exact dedup: group identical text, keep the smallest doc_id.
    * At scale: group by md5 (shuffle the 16-byte digest, not the text). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
      .select(col("keep_id"), col("copies"), col("text_md5"))
      .orderBy(col("keep_id"))

  /** Exact pairwise n-gram Jaccard ≥ threshold. The shingle-equality join
    * only materializes pairs that share ≥1 shingle — never the full cross
    * product — but is still the expensive exact path; see minhash LSH. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleDf(s, dir)
    jaccardVerify(s, sh,
      sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct())
  }

  /** Exact Jaccard for a set of candidate (id_a, id_b) pairs, filtered to
    * ≥ jaccardThreshold. */
  private def jaccardVerify(s: SparkSession, sh: DataFrame, cand: DataFrame): DataFrame = {
    val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("id_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(card.as("ca"), col("id_a") === col("ca.doc_id"))
      .join(card.as("cb"), col("id_b") === col("cb.doc_id"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("ca.n") + col("cb.n") - col("inter")).cast("double"))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private def jaccardVerifySql(candCte: String): String =
    s"""card AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT id_a, id_b, count(*) AS inter
       |  FROM cand JOIN sh sa ON id_a = sa.doc_id
       |            JOIN sh sb ON id_b = sb.doc_id AND sa.shingle = sb.shingle
       |  GROUP BY id_a, id_b)
       |SELECT id_a, id_b, inter,
       |  CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
       |FROM inter JOIN card ca ON id_a = ca.doc_id JOIN card cb ON id_b = cb.doc_id
       |WHERE CAST(inter AS DOUBLE) / CAST(ca.n + cb.n - inter AS DOUBLE) >= $jaccardThreshold
       |ORDER BY id_a, id_b""".stripMargin

  /** MinHash + LSH near-dup: 16 exact integer minhashes per doc, banded
    * 4×4; docs sharing any band signature become candidates; candidates
    * are verified with exact Jaccard. The scalable path: signatures are
    * one narrow shuffle, buckets are tiny, and the quadratic verify only
    * ever sees same-bucket pairs. */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = shingleDf(s, dir)
    val params = mhParams.toDF("j", "a", "b")
    val mh = sh
      .withColumn("h", TextFns.md5Int(col("shingle")))
      .crossJoin(broadcast(params))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(pmod(col("a") * col("h") + col("b"), lit(P))).as("mh"))
    val bands = mh
      .withColumn("band", expr("j div 4"))
      .groupBy(col("doc_id"), col("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("mh")))),
          x => x.getField("mh").cast("string")), ",").as("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    jaccardVerify(s, sh, cand)
  }

  /** SimHash near-dup: 32-bit signature = sign of per-bit weight sums over
    * token hashes (with multiplicity); byte-band blocking; Hamming ≤ 6 on
    * candidates. One signature per doc — the cheapest near-dup sketch. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bits = (0 until 32).map(b => (b, 1L << b)).toDF("bit", "pow")
    val tok = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("token"))
      .withColumn("h", TextFns.md5Int(col("token")))
    val sig = tok.crossJoin(broadcast(bits))
      .withColumn("contrib", when(expr("(h div pow) % 2") === 1, 1L).otherwise(-1L))
      .groupBy(col("doc_id"), col("bit"), col("pow"))
      .agg(sum(col("contrib")).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("w") > 0, col("pow")).otherwise(0L)).as("simhash"))
    val bandPow = Seq(0, 1, 2, 3).map(k => (k, 1L << (8 * k))).toDF("band", "bpow")
    val banded = sig.crossJoin(broadcast(bandPow))
      .withColumn("bval", expr("(simhash div bpow) % 256"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= hammingThreshold)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact embedding near-dup: all pairs with cosine ≥ threshold. Kept
    * exact as the ground truth; the blocked/ANN variant is
    * `sim_lsh_ann` in Similarity. Double-precision left-fold dot products
    * are bit-identical across engines. */
  def dedupEmbeddingCosine(s: SparkSession, dir: String): DataFrame = {
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val n = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    val a = n.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = n.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cosine") >= cosineThreshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedupExact _,
    "dedup_ngram_jaccard" -> dedupNgramJaccard _,
    "dedup_minhash_lsh" -> dedupMinhashLsh _,
    "dedup_simhash" -> dedupSimhash _,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine _,
  )

  private val mhValuesSql =
    mhParams.map { case (j, a, b) => s"($j, $a, $b)" }.mkString(", ")
  private val bitValuesSql =
    (0 until 32).map(b => s"($b, ${1L << b})").mkString(", ")
  private val bandValuesSql =
    Seq(0, 1, 2, 3).map(k => s"($k, ${1L << (8 * k)})").mkString(", ")

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS copies, md5(text) AS text_md5
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH sh AS ($shingleSql),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |${jaccardVerifySql("cand")}""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH sh AS ($shingleSql),
         |hp AS (SELECT * FROM (VALUES $mhValuesSql) AS t(j, a, b)),
         |hsh AS (SELECT doc_id, shingle, $md5IntSql AS h FROM sh),
         |mh AS (SELECT doc_id, j, min((a * h + b) % $P) AS mh FROM hsh, hp GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
         |  FROM mh GROUP BY doc_id, j // 4),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |${jaccardVerifySql("cand")}""".stripMargin,
    "dedup_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest($tokSql) AS token FROM documents)),
         |bits AS (SELECT * FROM (VALUES $bitValuesSql) AS t(bit, pow)),
         |sig AS (
         |  SELECT doc_id, CAST(sum(CASE WHEN w > 0 THEN pow ELSE 0 END) AS BIGINT) AS simhash
         |  FROM (
         |    SELECT doc_id, bit, pow, sum(CASE WHEN (h // pow) % 2 = 1 THEN 1 ELSE -1 END) AS w
         |    FROM tok, bits GROUP BY doc_id, bit, pow)
         |  GROUP BY doc_id),
         |bp AS (SELECT * FROM (VALUES $bandValuesSql) AS t(band, bpow)),
         |banded AS (SELECT doc_id, simhash, band, (simhash // bpow) % 256 AS bval FROM sig, bp),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
         |    x.simhash AS sh_a, y.simhash AS sh_b
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= $hammingThreshold
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_embedding_cosine" ->
      s"""WITH n AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
         |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
         |  FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  list_sum(list_transform(range(1, len(a.embedding) + 1),
         |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm) AS cosine
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
         |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm) >= $cosineThreshold
         |ORDER BY id_a, id_b""".stripMargin,
  )
}
