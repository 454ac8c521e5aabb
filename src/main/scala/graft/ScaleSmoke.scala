package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up experiment main: generates a synthetic corpus ~100× the
  * sf0.1 testdata (250k 64-dim vectors with 2.5k planted near-dups,
  * 100k documents with 1k planted near-dups) and drives the SCALE paths
  * of the similarity / dedup / sketch operators against it, printing one
  * flushed line per measurement. The small-SF oracle suite proves
  * correctness; this main answers "does the plan SHAPE survive two
  * orders of magnitude", which is where the round-4 experiment found
  * (and fixed) three real defects:
  *
  *  - generate-and-rank centroid assignment materialized a 625M-row
  *    window sort → replaced by the fused `nearest_centroid_ids` fold;
  *  - blocked-dedup verification re-joined the vector table into ~50M
  *    candidate pairs (~27 GB shuffle) → verification moved inside the
  *    block arrays (vectors ride with the assignment);
  *  - fixed-depth LSH kept 256 buckets at any corpus size → ~90k
  *    candidates/query at 250k rows, 60 GB of shuffle spill → the
  *    auto-depth serving path (`simLshAnnAuto`) sizes bits from the
  *    corpus statistic so bucket occupancy stays constant.
  *
  * Usage: runMain graft.ScaleSmoke [dir] — corpus is generated under
  * `dir` (default /tmp/scale) if absent; pass a fresh dir to regenerate.
  */
object ScaleSmoke {
  private def say(msg: String): Unit = { println(s"SCALE $msg"); Console.flush() }

  private def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    say(f"$tag%-52s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  val nVec = 250000L
  val nVecDup = 2500L
  val nDoc = 100000L
  val nDocDup = 1000L
  private val dim = 64

  def generate(s: SparkSession, dir: String): Unit = {
    val noise = (idc: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =>
      sin(idc * 12.9898 + d * 78.233) * lit(43758.5453) % 1.0
    val emb = s.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)), d => {
        val src = when(col("id") >= nVec - nVecDup, col("id") - nVecDup).otherwise(col("id"))
        (noise(src, d) + when(col("id") >= nVec - nVecDup, noise(col("id"), d) * 0.02)
          .otherwise(lit(0.0))).cast("float")
      }).as("embedding"))
    emb.repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // 10k-word Zipf-ish vocabulary: a tiny vocab makes every shingle
    // corpus-common, which turns ANY prefix-filtered similarity join
    // into all-pairs — real corpora are Zipfian, where rare shingles
    // exist and prefix filtering works (the 30-word first draft of this
    // generator filled 70 GB of spill in dedup_ngram_jaccard)
    val docs = s.range(nDoc).select(col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(1), lit(60) + pmod(col("id"), lit(40)).cast("int")), w => {
          val src = when(col("id") >= nDoc - nDocDup, col("id") - nDocDup).otherwise(col("id"))
          val nudge = when(col("id") >= nDoc - nDocDup,
            (w.cast("long") % 29 === 0).cast("long")).otherwise(lit(0L))
          concat(lit("w"), pmod(hash(src * 31 + w.cast("long") + nudge), lit(10000)))
        })).as("text"),
      element_at(array(lit("en"), lit("fr"), lit("de"), lit("es")),
        (pmod(col("id"), lit(4)) + 1).cast("int")).as("lang"),
      concat(lit("src"), pmod(col("id"), lit(8))).as("source"))
    docs.withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).appName("graft-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$dir/embeddings.parquet").exists())
      time("generate corpus")(generate(spark, dir))
    say(s"corpus: $nVec vectors ($nVecDup planted dups), $nDoc docs ($nDocDup planted dups)")

    // 1. the exact all-pairs ground truth must REFUSE this corpus
    try {
      ops.Dedup.dedupEmbeddingCosine(spark, dir).count()
      say("exact-cosine DID NOT refuse — GUARD BROKEN")
    } catch { case _: Exception => say("exact-cosine refused the 250k corpus as designed") }

    // 2. blocked embedding dedup, both quantizers (trained pays one
    //    training on first call, memoized after)
    val blocked = time("dedup_embedding_blocked (stride)") {
      val r = ops.Dedup.dedupEmbeddingBlocked(spark, dir).count(); r
    }
    say(s"  -> $blocked verified pairs (planted: $nVecDup)")
    val blockedT = time("dedup_embedding_blocked_trained (incl. training)") {
      ops.Dedup.dedupEmbeddingBlockedTrained(spark, dir).count()
    }
    say(s"  -> $blockedT verified pairs")

    // 3. IVF search, stride + trained (trained centroids now memoized)
    time("sim_ivf_topk (stride)")(noop(ops.Similarity.simIvfTopk(spark, dir)))
    time("sim_ivf_topk_trained (memoized quantizer)")(noop(ops.Similarity.simIvfTopkTrained(spark, dir)))

    // 4. auto-depth LSH: bits sized to the corpus (vs the pinned 8-bit
    //    index whose ~1000-vector buckets spill 60 GB here — not run)
    time("sim_lsh_ann_auto (depth from corpus stats)")(noop(ops.Similarity.simLshAnnAuto(spark, dir)))

    // 5. recall at scale: ANN paths vs the brute-force ground truth
    def topkPairs(df: DataFrame): Set[(Long, Long)] =
      df.select("q_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = time("sim_topk_bruteforce (ground truth, 5k queries x 250k)") {
      topkPairs(ops.Similarity.simTopkBruteforce(spark, dir))
    }
    def recallOf(tag: String, df: DataFrame): Unit = {
      val got = topkPairs(df)
      say(f"  recall@5 $tag: ${(exact intersect got).size.toDouble / exact.size}%.3f")
    }
    recallOf("ivf stride", ops.Similarity.simIvfTopk(spark, dir))
    recallOf("ivf trained", ops.Similarity.simIvfTopkTrained(spark, dir))
    recallOf("lsh auto", ops.Similarity.simLshAnnAuto(spark, dir))

    // 6. text dedup + sketch heavy hitters on 100k docs
    val mh = time("dedup_minhash_lsh (100k docs)") {
      ops.Dedup.dedupMinhashLsh(spark, dir).count()
    }
    say(s"  -> $mh minhash near-dup pairs (planted: $nDocDup)")
    time("dedup_ngram_jaccard (100k docs)")(noop(ops.Dedup.dedupNgramJaccard(spark, dir)))
    val hh = time("text_heavy_hitters_sketch (100k docs)") {
      ops.TextAnalysis.textHeavyHittersSketch(spark, dir).count()
    }
    say(s"  -> $hh served heavy hitters")

    say("done")
    spark.stop()
  }
}
