package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Similarity}

/** The persisted LSH index: build → serve parity with the in-session
  * path, external-query serving, and landing-zone append semantics. */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  private def shape(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))

  test("persisted index serves the stride query set byte-identically to sim_lsh_ann") {
    // the registered query: write-once to a temp index dir, serve from it
    val served = AnnIndex.simLshAnnServed(spark, sf0001).collect().map(shape).toSeq
    val inSession = Similarity.simLshAnn(spark, sf0001).collect().map(shape).toSeq
    assert(served.nonEmpty && served === inSession,
      "persisted-index serving diverged from the in-session ANN")
  }

  test("append hashes a landing batch with the INDEX's thresholds, and serving sees it") {
    val tmp = java.nio.file.Files.createTempDirectory("ann-append")
    val emb = Tables(spark, sf0001, "embeddings")
    // physically split the corpus: ~90% standing corpus, ~10% landing batch
    emb.filter(col("vec_id") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/corpus/embeddings.parquet")
    emb.filter(col("vec_id") % 10 === 0)
      .write.mode("overwrite").parquet(s"$tmp/batch/embeddings.parquet")
    AnnIndex.lshIndexWrite(spark, s"$tmp/corpus", s"$tmp/index")
    AnnIndex.lshIndexAppend(spark, s"$tmp/batch", s"$tmp/index")

    // 1. the appended bucket table holds exactly corpus ∪ batch vectors,
    //    each hashed with the index's persisted thresholds
    val bucketRows = spark.read.parquet(s"$tmp/index/buckets")
    val ids = bucketRows.select(col("vec_id")).distinct().collect().map(_.getLong(0)).toSet
    val allIds = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids === allIds, "appended index does not cover corpus ∪ batch")
    val perVec = bucketRows.groupBy(col("vec_id")).count()
      .select(col("count")).distinct().collect().map(_.getLong(0)).toSeq
    assert(perVec === Seq(Similarity.lshTables.toLong),
      s"every vector must land in exactly one bucket per table, got $perVec")

    // 2. a batch vector queried against the appended index finds ITSELF
    //    excluded but its corpus neighbors served: recall vs brute force
    //    over the union stays at the in-session path's level
    val queries = Similarity.normed(spark, sf0001)
      .filter(col("vec_id") % Similarity.queryStride === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val served = AnnIndex.lshIndexServe(spark, s"$tmp/index",
      Seq(s"$tmp/corpus", s"$tmp/batch"), queries).collect().map(shape)
    assert(served.nonEmpty, "appended index served nothing")
    val got = served.map(t => (t._1, t._3)).toSet
    val exact = Similarity.simTopkBruteforce(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.6, f"appended-index recall $recall%.3f below the 0.6 floor")
    // self-pairs never serve
    assert(served.forall(t => t._1 != t._3), "served a query to itself")
  }

  test("persisted IVF index serves byte-identically to the in-session auto path") {
    // on sf0001 the statistic-derived probe count and the persisted
    // list-count-derived one both floor at the pinned nProbe, the
    // centroids round-trip parquet exactly, and the scoring kernel is
    // shared — so the served frame must be byte-identical
    val served = AnnIndex.simIvfTopkServed(spark, sf0001).collect().map(shape).toSeq
    val inSession = Similarity.simIvfTopkAuto(spark, sf0001).collect().map(shape).toSeq
    assert(served.nonEmpty && served === inSession,
      "persisted-IVF serving diverged from the in-session auto path")
  }

  test("IVF append assigns a landing batch with the persisted quantizer") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-append")
    val emb = Tables(spark, sf0001, "embeddings")
    emb.filter(col("vec_id") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/corpus/embeddings.parquet")
    emb.filter(col("vec_id") % 10 === 0)
      .write.mode("overwrite").parquet(s"$tmp/batch/embeddings.parquet")
    AnnIndex.ivfIndexWrite(spark, s"$tmp/corpus", s"$tmp/index")
    AnnIndex.ivfIndexAppend(spark, s"$tmp/batch", s"$tmp/index")
    val lists = spark.read.parquet(s"$tmp/index/lists")
    val ids = lists.select(col("vec_id")).distinct().count()
    val all = Similarity.normed(spark, s"$tmp/corpus").count() +
      Similarity.normed(spark, s"$tmp/batch").count()
    assert(ids == all, s"appended IVF lists cover $ids of $all vectors")
    assert(lists.count() == all, "a vector must live in exactly ONE inverted list")
    // serving over the appended index still finds real neighbors
    val queries = Similarity.normed(spark, sf0001)
      .filter(col("vec_id") % Similarity.queryStride === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val served = AnnIndex.ivfIndexServe(spark, s"$tmp/index",
      Seq(s"$tmp/corpus", s"$tmp/batch"), queries).collect().map(shape)
    assert(served.nonEmpty && served.forall(t => t._1 != t._3),
      "appended-IVF serving empty or served a self-pair")
  }

  test("persisted IVF-PQ index serves byte-identically to the in-session composed path") {
    // centroids AND the codebook round-trip parquet exactly (doubles),
    // the persisted code rows equal the in-session pq_codes projection,
    // probe counts agree at sf0001 (both floor at nProbe), and the ADC
    // kernel + exact rescore are shared — so served == in-session
    val served = AnnIndex.simIvfPqTopkServed(spark, sf0001).collect().map(shape).toSeq
    val inSession = Similarity.simIvfPqTopk(spark, sf0001).collect().map(shape).toSeq
    assert(served.nonEmpty && served === inSession,
      "persisted IVF-PQ serving diverged from the in-session composed path")
  }

  test("IVF-PQ append encodes a landing batch with the FROZEN quantizer and codebook") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-append")
    val emb = Tables(spark, sf0001, "embeddings")
    emb.filter(col("vec_id") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/corpus/embeddings.parquet")
    emb.filter(col("vec_id") % 10 === 0)
      .write.mode("overwrite").parquet(s"$tmp/batch/embeddings.parquet")
    AnnIndex.ivfPqIndexWrite(spark, s"$tmp/corpus", s"$tmp/index")
    val cbBefore = spark.read.parquet(s"$tmp/index/codebook").head().getSeq[Double](0)
    AnnIndex.ivfPqIndexAppend(spark, s"$tmp/batch", s"$tmp/index")
    assert(spark.read.parquet(s"$tmp/index/codebook").head().getSeq[Double](0) === cbBefore,
      "append must not retrain the codebook")
    val lists = spark.read.parquet(s"$tmp/index/lists")
    val all = Similarity.normed(spark, s"$tmp/corpus").count() +
      Similarity.normed(spark, s"$tmp/batch").count()
    assert(lists.count() == all && lists.select(col("vec_id")).distinct().count() == all,
      "a vector must live in exactly ONE inverted list after append")
    // code rows are 8 small ints, never embeddings
    val firstCodes = lists.select(col("codes")).head().getSeq[Int](0)
    assert(firstCodes.length == Similarity.pqM, "persisted codes are not pqM-wide")
    val served = AnnIndex.ivfPqIndexServe(spark, s"$tmp/index",
      Seq(s"$tmp/corpus", s"$tmp/batch"),
      Similarity.normed(spark, sf0001)
        .filter(col("vec_id") % Similarity.queryStride === 0)
        .select(col("vec_id").as("q_id"), col("embedding"))).collect().map(shape)
    assert(served.nonEmpty && served.forall(t => t._1 != t._3),
      "appended IVF-PQ serving empty or served a self-pair")
  }

  test("compaction merges landing-zone small files; serving is identical before/after") {
    val tmp = java.nio.file.Files.createTempDirectory("ann-compact")
    val emb = Tables(spark, sf0001, "embeddings")
    // standing corpus (3/4 of ids — must include vec_id ≡ 1 (mod 100),
    // the stride quantizer's centroid seeds) + three landing batches
    emb.filter(col("vec_id") % 4 =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/corpus/embeddings.parquet")
    for (b <- 1 to 3)
      emb.filter(col("vec_id") % 4 === 0 && (col("vec_id") / 4) % 3 === b - 1)
        .write.mode("overwrite").parquet(s"$tmp/b$b/embeddings.parquet")
    AnnIndex.lshIndexWrite(spark, s"$tmp/corpus", s"$tmp/index")
    for (b <- 1 to 3) AnnIndex.lshIndexAppend(spark, s"$tmp/b$b", s"$tmp/index")
    val corpusDirs = Seq(s"$tmp/corpus", s"$tmp/b1", s"$tmp/b2", s"$tmp/b3")
    val queries = Similarity.normed(spark, sf0001)
      .filter(col("vec_id") % Similarity.queryStride === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val before = AnnIndex.lshIndexServe(spark, s"$tmp/index", corpusDirs, queries)
      .collect().map(shape).toSeq
    val (nBefore, nAfter) = AnnIndex.lshIndexCompact(spark, s"$tmp/index")
    assert(nBefore > nAfter && nAfter >= 1,
      s"compaction did not reduce the file count ($nBefore -> $nAfter)")
    val after = AnnIndex.lshIndexServe(spark, s"$tmp/index", corpusDirs, queries)
      .collect().map(shape).toSeq
    assert(before.nonEmpty && after === before,
      "serving changed across compaction — content was not preserved")
    assert(spark.read.parquet(s"$tmp/index/buckets").count() ==
      emb.count() * Similarity.lshTables,
      "compaction changed the bucket row count")

    // same contract for the IVF-PQ code lists
    AnnIndex.ivfPqIndexWrite(spark, s"$tmp/corpus", s"$tmp/pqindex")
    for (b <- 1 to 3) AnnIndex.ivfPqIndexAppend(spark, s"$tmp/b$b", s"$tmp/pqindex")
    val pqBefore = AnnIndex.ivfPqIndexServe(spark, s"$tmp/pqindex", corpusDirs, queries)
      .collect().map(shape).toSeq
    val (pb, pa) = AnnIndex.ivfPqIndexCompact(spark, s"$tmp/pqindex")
    assert(pb > pa, s"IVF-PQ compaction did not reduce files ($pb -> $pa)")
    val pqAfter = AnnIndex.ivfPqIndexServe(spark, s"$tmp/pqindex", corpusDirs, queries)
      .collect().map(shape).toSeq
    assert(pqBefore.nonEmpty && pqAfter === pqBefore,
      "IVF-PQ serving changed across compaction")
  }

  test("filtered ANN equals an equi-join reference over the label slice, byte for byte") {
    // reference: expand candidate pairs via the bucket equi-join (as in
    // DedupSimilaritySpec's tiled-scoring reference), restrict MEMBERS
    // to the label slice, score, rank — filtered serving must match
    // exactly, because tiling is rank-exact over whatever candidate set
    // enters the cells
    import org.apache.spark.sql.expressions.Window
    val (tables, bits) = (Similarity.lshTables, Similarity.lshBits)
    val buckets = Similarity.lshBuckets(spark, sf0001, tables, bits)
    val qb = buckets.filter(col("vec_id") % Similarity.queryStride === 0)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
      .select(col("q_id"), col("tbl"),
        explode(array(col("bucket") +:
          (0 until bits).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)).as("bucket"))
    val sliceIds = Tables(spark, sf0001, "embeddings")
      .filter(col("label") === Similarity.annFilterLabel).select(col("vec_id"))
    val cand = buckets.join(qb, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(sliceIds, "vec_id")
      .select(col("q_id"), col("vec_id").as("cand_id"))
      .distinct()
    val n = Similarity.normed(spark, sf0001)
    val q = n.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val c = n.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("cand_id"))
    val reference = cand.join(q, "q_id").join(c, "cand_id")
      .withColumn("cosine", graft.plans.VectorFunctions.vec_dot(col("q_emb"), col("c_emb"))
        / (col("q_nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= Similarity.topK)
      .select(col("q_id"), col("rk"), col("cand_id"), col("cosine"))
      .orderBy(col("q_id"), col("rk"))
      .collect().map(shape).toSeq
    val filtered = AnnIndex.simLshAnnFiltered(spark, sf0001).collect().map(shape).toSeq
    assert(filtered.nonEmpty && filtered === reference,
      "filtered serving diverged from the label-sliced equi-join reference")

    // NOT a post-hoc filter of the unfiltered top-k: the slice ranking
    // digs past it, so some served pair must be absent from it
    val unfiltered = AnnIndex.simLshAnnServed(spark, sf0001).collect().map(shape)
      .map(t => (t._1, t._3)).toSet
    assert(filtered.exists(t => !unfiltered.contains((t._1, t._3))),
      "filtered result is a subset of the unfiltered top-k — post-filter semantics")
  }

  test("the filtered member predicate is pushed into the parquet scan") {
    val plan = AnnIndex.simLshAnnFiltered(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"EqualTo(label,${Similarity.annFilterLabel})"),
      "label predicate not pushed to the embeddings member scan:\n" +
        plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("external queries with fresh ids serve exact cosines from the index") {
    // queries NOT in the corpus (ids offset far past the id space, vectors
    // perturbed): every served cosine must bit-equal a driver recompute
    val tmp = java.nio.file.Files.createTempDirectory("ann-external")
    AnnIndex.lshIndexWrite(spark, sf0001, s"$tmp/index")
    val queries = Similarity.normed(spark, sf0001)
      .filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") + lit(1000000L)).as("q_id"),
        // shift one coordinate so the query is genuinely external
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(0.25f)).otherwise(x)).as("embedding"))
    val served = AnnIndex.lshIndexServe(spark, s"$tmp/index", Seq(sf0001), queries)
      .collect().map(shape)
    assert(served.nonEmpty, "external queries served nothing")
    val vecs = Similarity.normed(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getDouble(2))).toMap
    val qvecs = queries.withColumn("nrm",
        sqrt(graft.plans.VectorFunctions.vec_dot(col("embedding"), col("embedding"))))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1).toArray, r.getDouble(2))).toMap
    val bad = served.count { case (q, _, c, cos) =>
      val (qv, qn) = qvecs(q)
      val (cv, cn) = vecs(c)
      var acc = 0.0
      var d = 0
      while (d < qv.length) { acc += qv(d).toDouble * cv(d).toDouble; d += 1 }
      acc / (qn * cn) != cos
    }
    assert(bad == 0, s"$bad served cosines differ from driver recompute")
  }

  test("stride twins: persisted-index serve == the oracled scan form; filter restricts members") {
    // the round-9 oracle pin made executable at spec scale: the serve
    // composition (persisted stride index, fixed probes) is value-equal
    // to sim_ivf_topk, and the filtered twin's candidates all come from
    // the label slice while its queries stay unrestricted
    val servedStride = AnnIndex.simIvfTopkServedStride(spark, sf0001)
      .collect().map(shape).toSeq
    val scan = Similarity.simIvfTopk(spark, sf0001).collect().map(shape).toSeq
    assert(servedStride.nonEmpty && servedStride === scan,
      "stride serve twin diverged from the oracled scan form")
    val filtered = AnnIndex.simIvfTopkFilteredStride(spark, sf0001).collect()
    assert(filtered.nonEmpty, "filtered stride twin returned nothing (vacuous)")
    val slice = Tables(spark, sf0001, "embeddings")
      .filter(org.apache.spark.sql.functions.col("label") === Similarity.annFilterLabel)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(filtered.forall(r => slice.contains(r.getLong(2))),
      "filtered stride twin served an out-of-slice candidate")
  }
}
