package graft

/** Plan-evidence main: writes `.explain("formatted")` for a set of
  * registered queries to text files — the optimization rounds' plan
  * artifacts (`plans/r{N}/<query>_{before,after}.txt`), generated rather
  * than hand-copied so the committed evidence is exactly what the
  * session would produce.
  *
  * Environment (all optional; system-property twins for completeness —
  * this sandbox's sbt wrapper does not forward -D to the JVM):
  *   PLANDUMP_OUT=DIR       output directory (default plans/out)
  *   PLANDUMP_SUFFIX=S      filename suffix (default "after")
  *   PLANDUMP_SF=DIR        data directory (default /root/testdata/sf0.1)
  *   PLANDUMP_NAMES=a,b,c   query names (default: every registered query)
  *
  * Session settings mirror [[Bench]] so the dumped plans are the plans
  * the bench times. Building a served/streaming query's DataFrame runs
  * its artifact/replay side effects first — that is the real serving
  * shape, and it is what makes the dumped plan the served plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    def opt(env: String, prop: String): Option[String] =
      sys.env.get(env).orElse(sys.props.get(prop))
    val outDir = opt("PLANDUMP_OUT", "plandump.out").getOrElse("plans/out")
    val suffix = opt("PLANDUMP_SUFFIX", "plandump.suffix").getOrElse("after")
    val sf = opt("PLANDUMP_SF", "plandump.sf").getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val names = opt("PLANDUMP_NAMES", "plandump.names")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "2097152"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sf)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
