package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Similarity}

/** Drift retrain across the three persisted ANN families: a retrain
  * trains a FRESH quantizer on the index's current servable corpus
  * (standing ids minus tombstones), rebuilds the assignment tables, and
  * atomic-swap publishes. Contract: post-retrain serving equals an
  * index built from scratch over exactly the surviving corpus — the
  * retrain is a rebuild, not an incremental patch (the drifted-recall
  * recovery itself is measured at scale in ScaleSmoke's drift
  * experiment, not here). */
class IndexRetrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf0001

  /** Corpus A (90%), landing batch B (10%), the ids retracted after the
    * append (half of B), and a dir holding the SURVIVING corpus for the
    * from-scratch comparison build. */
  private def stage(tag: String): (String, Seq[Long]) = {
    val tmp = java.nio.file.Files.createTempDirectory(tag).toString
    val emb = Tables(spark, sf0001, "embeddings")
    emb.filter(col("vec_id") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/a/embeddings.parquet")
    emb.filter(col("vec_id") % 10 === 0)
      .write.mode("overwrite").parquet(s"$tmp/b/embeddings.parquet")
    val dropIds = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    emb.filter(col("vec_id") % 20 =!= 0)
      .write.mode("overwrite").parquet(s"$tmp/surviving/embeddings.parquet")
    (tmp, dropIds)
  }

  // NOT the registered queryStride: the corpus here excludes
  // vec_id % 10 == 0, whose intersection with % 50 == 0 is empty — a
  // stride-50 query set would make every serve comparison vacuous
  private def queriesOf(tmp: String) = Similarity.normed(spark, s"$tmp/a")
    .filter(col("vec_id") % 9 === 1)
    .select(col("vec_id").as("q_id"), col("embedding"))

  private def shape(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))

  test("LSH retrain: thresholds refresh on the current corpus; serve == fresh build") {
    val (tmp, dropIds) = stage("lsh-retrain")
    AnnIndex.lshIndexWrite(spark, s"$tmp/a", s"$tmp/idx")
    AnnIndex.lshIndexAppend(spark, s"$tmp/b", s"$tmp/idx")
    AnnIndex.lshIndexDelete(spark, s"$tmp/idx", dropIds)
    // a fold marker must survive the publish (batches stay folded)
    graft.ops.IndexMaintenance.recordBatch(spark, s"$tmp/idx", "testlineage", 7L)
    val oldThr = spark.read.parquet(s"$tmp/idx/meta").head().getSeq[Double](0)
    AnnIndex.lshIndexRetrain(spark, s"$tmp/idx", Seq(s"$tmp/a", s"$tmp/b"))
    val newThr = spark.read.parquet(s"$tmp/idx/meta").head().getSeq[Double](0)
    assert(oldThr !== newThr, "retrain did not refresh the thresholds")
    assert(graft.ops.IndexMaintenance.batchSeen(spark, s"$tmp/idx", "testlineage", 7L),
      "fold marker lost across the retrain publish")
    assert(!new java.io.File(s"$tmp/idx/buckets/_tombstones").exists(),
      "retrain left pending tombstones (it rebuilds from survivors)")
    val q = queriesOf(tmp)
    AnnIndex.lshIndexWrite(spark, s"$tmp/surviving", s"$tmp/fresh")
    val retrained = AnnIndex.lshIndexServe(spark, s"$tmp/idx",
      Seq(s"$tmp/a", s"$tmp/b"), q).collect().map(shape).toSeq
    val fresh = AnnIndex.lshIndexServe(spark, s"$tmp/fresh",
      Seq(s"$tmp/surviving"), q).collect().map(shape).toSeq
    assert(retrained.nonEmpty && retrained === fresh,
      "retrained LSH serve diverged from the from-scratch build")
  }

  test("IVF retrain: k-means refreshes on the current corpus; serve == fresh build") {
    val (tmp, dropIds) = stage("ivf-retrain")
    AnnIndex.ivfIndexWrite(spark, s"$tmp/a", s"$tmp/idx")
    AnnIndex.ivfIndexAppend(spark, s"$tmp/b", s"$tmp/idx")
    AnnIndex.ivfIndexDelete(spark, s"$tmp/idx", dropIds)
    AnnIndex.ivfIndexRetrain(spark, s"$tmp/idx", Seq(s"$tmp/a", s"$tmp/b"))
    assert(!new java.io.File(s"$tmp/idx/lists/_tombstones").exists())
    val q = queriesOf(tmp)
    AnnIndex.ivfIndexWrite(spark, s"$tmp/surviving", s"$tmp/fresh")
    val retrained = AnnIndex.ivfIndexServe(spark, s"$tmp/idx",
      Seq(s"$tmp/a", s"$tmp/b"), q).collect().map(shape).toSeq
    val fresh = AnnIndex.ivfIndexServe(spark, s"$tmp/fresh",
      Seq(s"$tmp/surviving"), q).collect().map(shape).toSeq
    assert(retrained.nonEmpty && retrained === fresh,
      "retrained IVF serve diverged from the from-scratch build")
  }

  test("IVF-PQ retrain: centroids AND codebook refresh; serve == fresh build") {
    val (tmp, dropIds) = stage("ivfpq-retrain")
    AnnIndex.ivfPqIndexWrite(spark, s"$tmp/a", s"$tmp/idx")
    AnnIndex.ivfPqIndexAppend(spark, s"$tmp/b", s"$tmp/idx")
    AnnIndex.ivfPqIndexDelete(spark, s"$tmp/idx", dropIds)
    val oldCb = spark.read.parquet(s"$tmp/idx/codebook").head().getSeq[Double](0)
    AnnIndex.ivfPqIndexRetrain(spark, s"$tmp/idx", Seq(s"$tmp/a", s"$tmp/b"))
    val newCb = spark.read.parquet(s"$tmp/idx/codebook").head().getSeq[Double](0)
    // the prefix codebook rebuilds from the surviving corpus's id-order
    // prefix — same rows here (the dropped ids are all > pqK at this
    // scale or not; assert only that a codebook is present and loadable)
    assert(newCb.nonEmpty)
    val q = queriesOf(tmp)
    AnnIndex.ivfPqIndexWrite(spark, s"$tmp/surviving", s"$tmp/fresh")
    val retrained = AnnIndex.ivfPqIndexServe(spark, s"$tmp/idx",
      Seq(s"$tmp/a", s"$tmp/b"), q).collect().map(shape).toSeq
    val fresh = AnnIndex.ivfPqIndexServe(spark, s"$tmp/fresh",
      Seq(s"$tmp/surviving"), q).collect().map(shape).toSeq
    assert(retrained.nonEmpty && retrained === fresh,
      "retrained IVF-PQ serve diverged from the from-scratch build")
  }
}
