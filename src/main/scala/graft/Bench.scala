package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR.
  *
  * Each query is materialized through the noop sink — unlike `count()`,
  * this keeps sorts and all projected expressions in the plan (count()
  * would let Catalyst eliminate ORDER BY and prune the very expressions
  * being benchmarked). One untimed warmup pass amortizes JVM/codegen
  * warmup and OS page cache, so timings reflect steady-state throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // the sf dirs are single ~1-20 MB parquet files; the 128 MB default
      // would scan each on one thread. On a real cluster leave the default.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "2097152"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup: one untimed pass
    names.foreach { n =>
      try materialize(n)
      catch { case e: Throwable => System.err.println(s"[bench][warmup] $n: ${e.getMessage}") }
    }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = names.map { n =>
      val t0 = System.nanoTime()
      try materialize(n)
      catch { case e: Throwable =>
        failed += n
        System.err.println(s"[bench] $n FAILED: ${e.getMessage}")
      }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
