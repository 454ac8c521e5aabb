package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: break `sim_lsh_ann_auto` into its subtrees on a
  * given corpus and time each — the tool that isolated where the tiled
  * hot-bucket path spends its wall-clock at 250k rows. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).appName("graft-lshprofile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      Console.flush()
      r
    }
    val bytes = Tables(spark, dir, "embeddings")
      .queryExecution.optimizedPlan.stats.sizeInBytes.toDouble
    val bits = ops.Similarity.lshBitsFor(bytes / 350.0)
    println(s"PROF bits=$bits")
    val buckets = ops.Similarity.lshBuckets(spark, dir, ops.Similarity.lshTables, bits)
    t("buckets materialize+cache")(buckets.count())
    val sizes = buckets.groupBy(col("tbl"), col("bucket")).agg(count(lit(1)).as("bsz"))
    val st = t("bucket statistic")(
      sizes.agg(count(lit(1)).as("n"), avg(col("bsz")).as("occupancy"), max(col("bsz")).as("biggest"))
        .collect()(0))
    println(s"PROF buckets: $st")
    val vol = t("scored-pair volume")(ops.Similarity.lshScoredPairVolume(
      spark, dir, ops.Similarity.lshTables, bits, multiprobe = true))
    println(s"PROF scored pairs=$vol")
    t("scored candidates count") {
      println("PROF cand=" + ops.Similarity.lshScoredCandidates(
        spark, dir, ops.Similarity.lshTables, bits, multiprobe = true).count())
    }
    t("full simLshAnnAuto noop") {
      ops.Similarity.simLshAnnAuto(spark, dir).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
