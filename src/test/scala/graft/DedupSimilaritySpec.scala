package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Similarity}

/** Semantics checks for the sketch-based operators that have no SQL
  * oracle path (LSH ANN) plus recall properties of the ones that do. */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  test("minhash LSH candidates recover all high-jaccard pairs (recall=1 here)") {
    val exact = Dedup.dedupNgramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH(16 hashes, 4x4 bands) at threshold 0.7 should not miss planted dups
    assert(exact.subsetOf(lsh) || lsh.subsetOf(exact))
    assert((exact intersect lsh).size >= (exact.size * 9) / 10,
      s"recall too low: ${lsh.size} of ${exact.size}")
  }

  test("simhash near-pairs have genuinely close signatures") {
    val rows = Dedup.dedupSimhash(spark, sf0001).collect()
    assert(rows.forall(_.getLong(2) <= Dedup.hammingThreshold))
    // pairs are distinct and ordered
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length === pairs.length)
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("exact dedup keeps one representative per distinct text") {
    val total = graft.Tables(spark, sf0001, "documents").count()
    val groups = Dedup.dedupExact(spark, sf0001)
    assert(groups.select("keep_id").distinct().count() === groups.count())
    import org.apache.spark.sql.functions._
    val copies = groups.agg(sum("copies")).head().getLong(0)
    assert(copies === total)
  }

  test("clusters group the verified pairs; empty on a duplicate-free corpus") {
    import spark.implicits._
    // real corpus: every clustered doc appears in some verified pair
    val pairs = Dedup.dedupNgramJaccard(spark, sf0001).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val clusters = Dedup.dedupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.map(_._1).toSet === pairs)
    assert(clusters.forall { case (doc, cl) => cl <= doc })
    // duplicate-free corpus: no NPE, empty result
    val tmp = java.nio.file.Files.createTempDirectory("nodup")
    Seq((1L, "alpha beta gamma delta epsilon zeta", "en", "s", 30L),
      (2L, "one two three four five six seven", "en", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    assert(Dedup.dedupClusters(spark, tmp.toString).count() === 0)
  }

  test("brute-force top-k: k rows per query, self excluded, descending") {
    val rows = Similarity.simTopkBruteforce(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      assert(rs.length === Similarity.topK)
      assert(rs.forall(_.getLong(2) != q), s"self match for $q")
      val sims = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"not descending for $q")
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("LSH ANN returns same-bucket true neighbors with measurable recall") {
    val exact = Similarity.simTopkBruteforce(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.simLshAnn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(f"LSH ANN recall@5 vs brute force: $recall%.3f (${ann.size} candidates)")
    assert(ann.nonEmpty)
    assert(recall >= 0.3, f"recall $recall%.3f below 0.3")
  }
}
